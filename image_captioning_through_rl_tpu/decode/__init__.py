"""Caption decoding: greedy and value-guided beam search."""

from .greedy import greedy_decode, greedy_decode_full_prefix
from .beam import beam_search

__all__ = ["greedy_decode", "greedy_decode_full_prefix", "beam_search"]
