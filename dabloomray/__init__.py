"""dabloomray — Ray-Data-native distributed sketch / approximate-aggregation
library with the query capabilities of bitly/dablooms (scaling counting
Bloom filters), plus companion HLL / count-min / t-digest / KLL sketches
and web-text dedup pipelines. See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"


def dablooms_version() -> str:
    """Reference parity shim (dablooms_version, src/dablooms.c ≈L28)."""
    return __version__
