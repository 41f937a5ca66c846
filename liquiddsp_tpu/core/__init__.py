from liquiddsp_tpu.core.config import (  # noqa: F401
    Modulation,
    InnerCode,
    OuterCode,
    FrameConfig,
    ConfigurationMap,
    NUM_MODULATIONS,
    NUM_INNER_CODES,
    NUM_OUTER_CODES,
    NUM_CONFIGS,
)
