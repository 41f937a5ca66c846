from liquiddsp_tpu.ops.fec import block, conv, registry, rs  # noqa: F401
from liquiddsp_tpu.ops.fec.registry import (  # noqa: F401
    inner_decode,
    inner_encode,
    inner_encoded_bits,
    outer_decode,
    outer_encode,
    outer_encoded_bits,
)
