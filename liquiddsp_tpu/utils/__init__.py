from liquiddsp_tpu.utils import metrics  # noqa: F401
from liquiddsp_tpu.utils.metrics import LinkMetrics, MetricsCollector, profile_trace  # noqa: F401
