"""Caption decoding: greedy, value-guided beam search, and sampling."""

from .greedy import greedy_decode, greedy_decode_full_prefix
from .beam import beam_search
from .beam_compat import beam_search_compat
from .beam_full import beam_search_full_prefix
from .sample import sample_decode, sample_decode_full_prefix, sample_decode_n
from ..ops.pallas_decode import fused_greedy_decode
from ..ops.pallas_sample import fused_sample_decode

__all__ = [
    "greedy_decode",
    "greedy_decode_full_prefix",
    "fused_greedy_decode",
    "fused_sample_decode",
    "beam_search",
    "beam_search_compat",
    "beam_search_full_prefix",
    "sample_decode",
    "sample_decode_full_prefix",
    "sample_decode_n",
]
