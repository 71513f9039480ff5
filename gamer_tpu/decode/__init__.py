from gamer_tpu.decode.trie import LeveledTrie
from gamer_tpu.decode.beam import BeamSearchConfig, constrained_beam_search

__all__ = ["LeveledTrie", "BeamSearchConfig", "constrained_beam_search"]
