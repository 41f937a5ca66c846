from liquiddsp_tpu.phy import detector, frame_spec, framegen, framesync  # noqa: F401
from liquiddsp_tpu.phy.frame_spec import FrameSpec, HEADER_SYMS, PREAMBLE_SYMS  # noqa: F401
