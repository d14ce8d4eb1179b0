"""Global protocol constants.

Reference: common/src/consts.rs — XLEN=32 (operand bit width), LOG_K_CHUNK=4
(one-hot chunk log-size, K_CHUNK=16), LOG_K=64 (interleaved two-operand
address width); DEFAULT_SCALE=8 fractional bits (model quantization).
"""

XLEN = 32
LOG_K_CHUNK = 4
K_CHUNK = 1 << LOG_K_CHUNK
LOG_K = 64
DEFAULT_SCALE = 8
