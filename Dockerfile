# graph_weather_tpu — TPU-native weather ML framework
# For TPU VMs use a jax[tpu] base; this image covers CPU development/tests.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY graph_weather_tpu ./graph_weather_tpu
COPY tests ./tests
COPY examples ./examples
COPY bench.py ./

RUN pip install --no-cache-dir -e .[test] pandas

# default: run the example trainer on synthetic data
CMD ["python", "examples/train_forecaster.py", "--steps", "100", "--spacing", "10"]
