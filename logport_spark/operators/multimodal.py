"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as `binary` columns exactly the
way the `html` column does in the input_hint schema. The Spark-side plumbing
(schema, Arrow batch shape, mapInPandas signatures, partitioning) is real
and tested; the actual media decode is STUBBED — the decode libraries
(Pillow/ffmpeg/librosa) are not in this container, so `decode_media` raises
NotImplementedError unless the deterministic fake decoder is requested.

Metadata extraction (byte length, magic-byte sniffing, UTF-8 validity) is
pure-JVM / vectorized and runs for real.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"GIF8": "gif",
    b"RIFF": "riff",
    b"<!DO": "html",
    b"<htm": "html",
}

META_DDL = (
    "url string, byte_len long, magic_hex string, sniffed_type string, "
    "is_utf8 boolean"
)


def binary_meta(pages: DataFrame, bin_col: str = "html") -> DataFrame:
    """Typed metadata over the opaque binary column — JVM expressions only.

    utf8-validity probe: Spark decodes invalid bytes with replacement, so we
    detect the datagen's invalid marker bytes (\\xff\\xfe — never valid UTF-8)
    via hex scan; magic sniffing via prefix compare."""
    prefix = F.hex(F.expr(f"substring({bin_col}, 1, 4)"))
    sniff = F.lit("bin")
    for magic, name in MAGIC.items():
        sniff = F.when(
            prefix.startswith(magic.hex().upper()[: len(magic) * 2]), F.lit(name)
        ).otherwise(sniff)
    return pages.select(
        "url",
        F.octet_length(F.col(bin_col)).alias("byte_len"),
        F.hex(F.expr(f"substring({bin_col}, 1, 8)")).alias("magic_hex"),
        sniff.alias("sniffed_type"),
        (~F.hex(F.col(bin_col)).contains("FFFE")).alias("is_utf8"),
    )


def _pil_available() -> bool:
    """Capability probe: real image decode needs Pillow (absent here)."""
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def decode_media(payload: bytes, kind: str, fake: bool = False) -> dict:
    """Decode one media payload.

    Capability-gated swap point: when Pillow is installed (a real cluster),
    the real decoder runs with NO code edits; in this container (no
    Pillow/ffmpeg) the deterministic fake must be requested explicitly."""
    if not fake:
        if _pil_available():  # pragma: no cover - decode libs absent here
            import io

            from PIL import Image

            with Image.open(io.BytesIO(payload)) as im:
                return {"width": im.width, "height": im.height,
                        "frames": getattr(im, "n_frames", 1)}
        raise NotImplementedError(
            "media decode requires Pillow/ffmpeg — not available in this "
            "container; pass fake=True for the deterministic fake decoder"
        )
    # deterministic fake: 'dimensions' derived from payload bytes
    h = sum(payload[:16]) if payload else 0
    return {"width": 16 + h % 64, "height": 16 + (h // 64) % 64, "frames": 1 + len(payload) % 4}


FEATURES_DDL = "url string, width int, height int, frames int, feat array<float>"


def extract_features(pages: DataFrame, bin_col: str = "html",
                     fake_decode: bool = True, n_feat: int = 8) -> DataFrame:
    """mapInPandas feature extraction: the real Spark plumbing for a media
    pipeline (Arrow batches of binary → struct metadata + feature vector).
    The decode inside is the deterministic fake unless real libs exist."""

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf["url"], pdf[bin_col]):
                payload = bytes(payload) if payload is not None else b""
                meta = decode_media(payload, "image", fake=fake_decode)
                # stride sums vectorized (the pq_encode lesson: the tower
                # inside an Arrow batch is a numpy kernel, never a Python
                # byte loop — exact ints, so output is bit-identical to
                # the original per-byte form)
                if payload:
                    arr = np.frombuffer(payload, dtype=np.uint8)
                    feat = [
                        float((int(arr[i::n_feat].sum(dtype=np.int64))
                               % 997) / 997.0)
                        for i in range(n_feat)
                    ]
                else:
                    feat = [0.0] * n_feat
                rows.append({"url": url, **meta, "feat": feat})
            yield pd.DataFrame(rows, columns=["url", "width", "height", "frames", "feat"])

    return pages.select("url", bin_col).mapInPandas(run, FEATURES_DDL)


RESIZE_DDL = "url string, width int, height int, out_w int, out_h int, resized binary"


def resize_images(pages: DataFrame, bin_col: str = "html", max_side: int = 32,
                  fake_decode: bool = True) -> DataFrame:
    """mapInPandas resize: aspect-preserving clamp of the longer side to
    `max_side`. Plumbing (Arrow binary in/out, per-batch shape, target-size
    arithmetic) is real; the pixel resample is the deterministic fake
    (payload truncated to out_w*out_h bytes) — swap `decode_media`/the fake
    body for Pillow on a real cluster, nothing else changes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf["url"], pdf[bin_col]):
                payload = bytes(payload) if payload is not None else b""
                meta = decode_media(payload, "image", fake=fake_decode)
                w, h = meta["width"], meta["height"]
                scale = min(1.0, max_side / max(w, h, 1))
                ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
                rows.append({"url": url, "width": w, "height": h,
                             "out_w": ow, "out_h": oh,
                             "resized": payload[: ow * oh]})
            yield pd.DataFrame(
                rows, columns=["url", "width", "height", "out_w", "out_h", "resized"])

    return pages.select("url", bin_col).mapInPandas(run, RESIZE_DDL)


FRAMES_DDL = "url string, frames int, frame_idx int, frame binary"


def sample_frames(pages: DataFrame, bin_col: str = "html", every: int = 2,
                  fake_decode: bool = True) -> DataFrame:
    """mapInPandas frame sampling: one output row per kept frame (row
    EXPLOSION inside the UDF — the batch-shape case ffmpeg pipelines hit).
    Frame selection arithmetic is real; frame bytes are the deterministic
    fake (payload windows)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf["url"], pdf[bin_col]):
                payload = bytes(payload) if payload is not None else b""
                n = decode_media(payload, "video", fake=fake_decode)["frames"]
                for i in range(0, n, every):
                    step = max(1, len(payload) // max(n, 1))
                    rows.append({"url": url, "frames": n, "frame_idx": i,
                                 "frame": payload[i * step:(i + 1) * step]})
            yield pd.DataFrame(rows, columns=["url", "frames", "frame_idx", "frame"])

    return pages.select("url", bin_col).mapInPandas(run, FRAMES_DDL)


def dct_phash60(gray) -> int:
    """The real perceptual-hash math, Pillow-free and unit-testable: 2-D
    DCT-II of a 32x32 grayscale array via the separable matrix form,
    top-left 8x8 low-frequency block minus DC, sign-vs-median bits —
    the classic pHash construction. Only the DECODE (bytes -> 32x32
    gray) needs Pillow; this kernel is pinned in pytest (translation
    invariance of a flat shift, small perturbation -> small hamming)."""
    import numpy as np

    k = np.arange(32)
    c = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / 64.0)
    d = c @ np.asarray(gray, dtype=np.float64) @ c.T
    low = d[:8, :8].flatten()[1:61]  # skip DC, keep 60
    med = float(np.median(low))
    h = 0
    for i, v in enumerate(low):
        h |= int(v > med) << i
    return h


def phash60(pages: DataFrame, bin_col: str = "html",
            fake_decode: bool = True) -> DataFrame:
    """60-bit perceptual hash per media payload — the signature that makes
    image dedup (the LAION-style near-dup sweep) a `simhash_pairs` problem.

    Real path (Pillow present, a real cluster): mapInPandas decode ->
    32x32 grayscale -> 2-D DCT (numpy) -> top-left 8x8 low-frequency
    block minus DC -> sign-vs-median bits. Fake path (this container): a
    'byte-block luminance' hash, pure JVM codegen — bit i is (payload
    byte at floor(i*len/60)) >= 128 over 60 evenly-spaced probes. The
    fake is genuinely locality-sensitive to byte edits (a small payload
    change flips few probes), so the downstream banding semantics are
    exercised for real, and it is SQL-oracle-able byte-for-byte via hex
    arithmetic (the mm_features oracle idiom).

    60 bits, not 64, so the hash stays positive in a signed long in BOTH
    engines (DuckDB BIGINT has no unsigned view) and so the signature
    drops straight into the simhash band machinery (4x15 narrow bands /
    C(6,3) 10-bit Manku blocks). Plan: 60 one-byte substring probes
    inside one codegen span — no Python, no shuffle."""
    if not fake_decode:
        if _pil_available():  # pragma: no cover - decode libs absent here
            import io

            import numpy as np
            from PIL import Image

            def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    rows = []
                    for url, payload in zip(pdf["url"], pdf[bin_col]):
                        im = Image.open(io.BytesIO(bytes(payload)))
                        g = np.asarray(
                            im.convert("L").resize((32, 32)), dtype=np.float64)
                        rows.append({"url": url, "phash": dct_phash60(g)})
                    yield pd.DataFrame(rows, columns=["url", "phash"])

            return pages.select("url", bin_col).mapInPandas(
                run, "url string, phash long")
        raise NotImplementedError(
            "real perceptual hashing needs Pillow — pass fake_decode=True "
            "for the deterministic byte-probe fake")
    n = F.octet_length(F.col(bin_col))
    h = F.lit(0).cast("long")
    for i in range(60):
        probe = F.expr(
            f"conv(hex(substring({bin_col}, "
            f"1 + CAST(floor({i} * octet_length({bin_col}) / 60) AS INT), "
            f"1)), 16, 10)").cast("long")
        bit = F.when((n > 0) & (probe >= 128), F.lit(1)).otherwise(
            F.lit(0)).cast("long")
        h = h.bitwiseOR(F.shiftleft(bit, i))
    return pages.select("url", h.alias("phash"))


def phash_pairs(sig: DataFrame, max_hamming: int = 3,
                max_bucket: int | None = None) -> DataFrame:
    """Near-duplicate media pairs from phash60 signatures: the EXACT
    hamming<=3 pair set via Manku C(6,3) 10-bit block banding — literally
    the simhash core (dedup._simhash_banded) keyed on the perceptual hash,
    so the scale contract (candidates ~20*n^2/2^31, cap_buckets guardrail)
    is inherited rather than re-derived. Output (u1, u2, hamming)."""
    from logport_spark.operators.dedup import simhash_pairs_blocked

    pairs = simhash_pairs_blocked(
        sig.select(F.col("url").alias("doc_id"),
                   F.col("phash").alias("simhash")),
        max_hamming=max_hamming, max_bucket=max_bucket)
    return pairs.select(F.col("d1").alias("u1"), F.col("d2").alias("u2"),
                        "hamming")


def caption_alignment(pages: DataFrame, tau: float = 0.35,
                      bin_col: str = "html", text_col: str = "text",
                      n_feat: int = 8) -> DataFrame:
    """Image-text alignment filtering — the CLIP-score gate every
    image-text training corpus runs (LAION keeps pairs with CLIP cosine
    >= 0.28 between the image tower and the caption tower). Both towers
    here are the deterministic oracle-able stand-ins; the swap points
    are explicit: the image vector is `extract_features`' mapInPandas
    embedding (drop CLIP's image encoder into that UDF), the caption
    vector is an md5 hashing-trick bag-of-tokens (drop the text encoder
    into the same Arrow shape).

    Plan: one mapInPandas pass for image vectors (Arrow-batched), one
    explode + partial-aggregated conditional-sum pass for caption
    vectors (the lang_segments shape — never k interpreted-HOF filter
    counts per row), ONE url-keyed join, then pure-double cosine with a
    pinned evaluation order: dot and norms are exact-integer sums, so
    sqrt/divide are single correctly-rounded IEEE ops and round(.,4) is
    engine-identical — the score is hash-exact, not approximately equal.
    Output: (url, align_score, kept)."""
    feats = extract_features(pages, bin_col=bin_col, fake_decode=True,
                             n_feat=n_feat)
    # exact integer components: feat[i] = k/997 with k < 997, float32
    # error << 0.5, so round(feat*997) recovers k exactly
    img = feats.select(
        "url", *[F.round(F.element_at("feat", i + 1) * 997)
                 .cast("long").alias(f"k{i}") for i in range(n_feat)])
    toks = (pages.select("url", F.explode(
        F.split(F.col(text_col), " ")).alias("tok"))
        .filter(F.length("tok") > 0)
        .select("url", (F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10)
                        .cast("long") % n_feat).alias("b")))
    cap = toks.groupBy("url").agg(
        *[F.sum(F.when(F.col("b") == i, 1).otherwise(0)).alias(f"c{i}")
          for i in range(n_feat)])
    j = img.join(cap, "url", "left")
    dot = sum((F.col(f"k{i}") * F.coalesce(F.col(f"c{i}"), F.lit(0))
               ).cast("double") for i in range(n_feat))
    na = F.sqrt(sum((F.col(f"k{i}") * F.col(f"k{i}")).cast("double")
                    for i in range(n_feat)))
    nb = F.sqrt(sum((F.coalesce(F.col(f"c{i}"), F.lit(0))
                     * F.coalesce(F.col(f"c{i}"), F.lit(0))).cast("double")
                    for i in range(n_feat)))
    score = F.when((na > 0) & (nb > 0),
                   F.round(dot / (na * nb), 4)).otherwise(F.lit(0.0))
    return j.select("url", score.alias("align_score"),
                    (score >= F.lit(tau)).alias("kept"))
