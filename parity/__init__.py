"""Reference-parity tooling (NOT part of the TPU framework runtime).

This package runs the PyTorch reference (/root/reference or a checkout
pointed to by GRAPH_WEATHER_REF) against graph_weather_tpu on identical
graphs and converted weights, producing golden activations that the CI
parity tests consume WITHOUT needing torch or the reference installed.
"""
