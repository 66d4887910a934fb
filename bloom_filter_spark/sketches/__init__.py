"""Pure-numpy mergeable sketch kernels.

Every sketch implements the MergeableSketch protocol (sketches/base.py):
    empty() → state, update_*(state, batch), merge(a, b),
    serialize(state) → bytes, deserialize(blob) → (params, state)
which the Spark operator layer (operators/) lifts into a distributed
partial → merge-tree → final aggregation.
"""

from .base import SKETCH_KINDS, MergeableSketch, sketch_for_kind  # noqa: F401
from .bloom import BloomParams, BloomSketch  # noqa: F401
from .counting_bloom import CountingBloomSketch  # noqa: F401
from .blocked_bloom import BlockedBloomParams, BlockedBloomSketch  # noqa: F401
from .cuckoo import CuckooParams, CuckooFilter  # noqa: F401
from .hll import HLLParams, HLLSketch  # noqa: F401
from .cms import CMSParams, CMSSketch  # noqa: F401
from .kll import KLLParams, KLLSketch  # noqa: F401
from .tdigest import TDigestParams, TDigestSketch  # noqa: F401
from .misra_gries import MGParams, MGSketch  # noqa: F401
from .reservoir import ReservoirParams, ReservoirSketch  # noqa: F401
from .kmv import KMVParams, KMVSketch, KMVState  # noqa: F401
from .count_sketch import CountSketchParams, CountSketch  # noqa: F401
from .ddsketch import DDSketchParams, DDSketch, DDState  # noqa: F401
