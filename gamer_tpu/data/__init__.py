from gamer_tpu.data.vocab import SemanticVocab
from gamer_tpu.data.contract import DataFiles

__all__ = ["SemanticVocab", "DataFiles"]
