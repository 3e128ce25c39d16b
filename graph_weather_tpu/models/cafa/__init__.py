"""CaFA: factorized (axial) attention forecaster on regular grids.

Equivalent of reference models/cafa/ (model.py, factorize.py, encoder.py,
processor.py, decoder.py): strided-conv encoder, a stack of factorized
transformer blocks (height-axis attention then width-axis attention then
FFN, all pre-norm residual), transposed-conv decoder, with odd-size input
padding. TPU-native: NHWC layout internally (XLA's native conv layout),
axial attention as batched einsum softmax attention.
"""

from graph_weather_tpu.models.cafa.model import (
    AxialAttention,
    CaFADecoder,
    CaFAEncoder,
    CaFAForecaster,
    CaFAProcessor,
    FactorizedAttention,
    FactorizedTransformerBlock,
)

__all__ = [
    "AxialAttention",
    "CaFADecoder",
    "CaFAEncoder",
    "CaFAForecaster",
    "CaFAProcessor",
    "FactorizedAttention",
    "FactorizedTransformerBlock",
]
