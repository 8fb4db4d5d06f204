from .sketch_agg import (
    build_sketches, rollup_sketches, finalize_stats, with_window, sha256_key,
)
from .probe import probe_sketches
from .prefix_join import longest_prefix_join
