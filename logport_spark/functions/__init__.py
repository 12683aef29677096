"""Column-level kernel functions — the engine's stable expression API.

One import point for the reusable JVM-side kernels scattered across the
operator modules. Everything here returns a `Column` (or an expr string)
and runs inside whole-stage codegen — no Python in any of them.
"""

from ..operators.parse import json_quote, jvm_json_quote, ts_string
from ..operators.textstats import shingles_expr
from ..operators.transport import batch_key
from ..plans.ledger import bucket_col

__all__ = [
    "ts_string",        # '%lld.%.9ld' envelope timestamp from a timestamp col
    "jvm_json_quote",   # JSON string-encode, byte-identical to json.dumps
    "json_quote",       # the Python twin (property-tested equal)
    "bucket_col",       # crc32(url) % n deterministic progress/salt bucket
    "shingles_expr",    # token n-gram shingle array (SQL expr string)
    "batch_key",        # sha1 content address of a wire batch (idempotence key)
]
