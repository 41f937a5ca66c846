from liquiddsp_tpu.runtime import blocks, bus, stream  # noqa: F401
from liquiddsp_tpu.runtime.blocks import FlexTx, FlexRx, FrameDetectorCC  # noqa: F401
from liquiddsp_tpu.runtime.bus import MessageBus, PDU  # noqa: F401
from liquiddsp_tpu.runtime.stream import StreamingRx  # noqa: F401
