"""Column-level kernel functions — the engine's stable expression API.

One import point for the reusable JVM-side kernels scattered across the
operator modules. Everything here returns a `Column` (or an expr string)
and runs inside whole-stage codegen — no Python in any of them. The two
sizing helpers return plain ints (plan-construction time, not runtime).
"""

from ..operators.dedup import canonical_url
from ..operators.enrich import domain_suffix_chain
from ..operators.parse import json_quote, jvm_json_quote, ts_string
from ..operators.sampling import sample_bucket
from ..operators.similarity import (
    lsh_band_params,
    lsh_band_params_measured,
    measure_band_agreement,
)
from ..operators.textstats import _dup_count_expr as dup_count_expr
from ..operators.textstats import _max_run_expr as max_run_expr
from ..operators.textstats import bpe_apply, shingles_expr
from ..operators.transport import batch_key
from ..plans.ledger import bucket_col, scaled_buckets
from ..streaming.dedup_stream import estimated_jaccard

__all__ = [
    "ts_string",        # '%lld.%.9ld' envelope timestamp from a timestamp col
    "jvm_json_quote",   # JSON string-encode, byte-identical to json.dumps
    "json_quote",       # the Python twin (property-tested equal)
    "bucket_col",       # crc32(url) % n deterministic progress/salt bucket
    "shingles_expr",    # token n-gram shingle array (SQL expr string)
    "batch_key",        # sha1 content address of a wire batch (idempotence key)
    "max_run_expr",     # most-frequent-element count of a sorted array (fold)
    "dup_count_expr",   # duplicated-element count of a sorted array (fold)
    "estimated_jaccard",  # matching-minhash fraction of two signature cols
    "scaled_buckets",   # input-sized sub-stream bucket count (power of two)
    "lsh_band_params",  # corpus-sized (n_tables, bits) for hyperplane LSH
    "lsh_band_params_measured",  # same, sized from MEASURED bg agreement
    "measure_band_agreement",    # per-pair background bit-agreement sample
    "canonical_url",    # canonical web-URL form (RE2-safe regex chain)
    "sample_bucket",    # md5 bucket in [0,10000) — deterministic sampling
    "domain_suffix_chain",  # dot-suffix array of a host (blocklist keys)
    "bpe_apply",        # learned-merge tokenize (padded-replace chain)
]
