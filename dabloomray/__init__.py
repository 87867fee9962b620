"""dabloomray — Ray-Data-native distributed sketch / approximate-aggregation
library with the query capabilities of bitly/dablooms (scaling counting
Bloom filters), plus companion HLL / count-min / t-digest / KLL sketches
and web-text dedup pipelines. See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"


def dablooms_version() -> str:
    """Reference parity shim (dablooms_version, src/dablooms.c ≈L28)."""
    return __version__


# public API (lazy-import-friendly: submodules import quickly)
from .params import BloomParams, ScalingPolicy  # noqa: E402
from .sketches.counting import CountingBloom, counting_bloom_factory  # noqa: E402
from .sketches.scaling import ScalingBloom  # noqa: E402
from .sketches.hll import HyperLogLog, hll_factory  # noqa: E402
from .sketches.cms import CountMinSketch, cms_factory  # noqa: E402
from .sketches.tdigest import TDigest, tdigest_factory  # noqa: E402
from .sketches.kll import KLL, kll_factory  # noqa: E402

__all__ = [
    "BloomParams", "ScalingPolicy", "CountingBloom", "ScalingBloom",
    "HyperLogLog", "CountMinSketch", "TDigest", "KLL",
    "counting_bloom_factory", "hll_factory", "cms_factory",
    "tdigest_factory", "kll_factory", "dablooms_version",
]
