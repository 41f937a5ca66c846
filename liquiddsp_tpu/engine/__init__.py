from liquiddsp_tpu.engine.cognitive_engine import CognitiveEngineBlock  # noqa: F401
from liquiddsp_tpu.engine.store import ArmStore  # noqa: F401
from liquiddsp_tpu.engine.bandits import CognitiveEngine  # noqa: F401
from liquiddsp_tpu.engine.knowledge import KnowledgeIndicator  # noqa: F401
