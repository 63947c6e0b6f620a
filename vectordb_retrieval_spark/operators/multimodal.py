"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extract / resize / frame-sample as Arrow-batched
kernels over ``mapInPandas``.

The decode step has two branches (mirroring sources/embedder.py's
model gate): ``decode_fn=None`` / ``codec="pil"`` lazily imports
Pillow executor-side and decodes real bitmaps — raising
``NotImplementedError`` where the library is absent (this sandbox) —
while ``fake_decode`` / ``codec="bytes"`` is the deterministic
byte-derived stand-in the oracle queries pin, so the Spark-side
plumbing — binary schema, Arrow batch shape, partitioned execution,
metadata struct — is real and tested end-to-end either way.

Scale design: payloads stay as Parquet ``binary`` columns; kernels
stream per Arrow batch (bounded memory per task), and feature outputs
are plain columns so downstream operators (dedup, ANN over extracted
embeddings) compose directly.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", modality: str = "image"
) -> DataFrame:
    """Wrap a source column as an opaque binary payload with typed
    metadata — the ingestion shape for multimodal tables."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.octet_length(F.col("payload")).alias("n_bytes"),
            F.lit("utf8-stub").alias("codec"),
        ),
    )


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image decoder: derives dimensions
    and a mean-intensity from the payload bytes."""
    h = hashlib.md5(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    mean_intensity = sum(payload) / max(len(payload), 1) / 255.0
    return {"width": width, "height": height, "mean_intensity": mean_intensity}


def pil_decode(payload: bytes) -> dict:
    """Real image decode via Pillow (lazy import — mirrors
    sources/embedder.py's sentence-transformers gate): dimensions +
    grayscale mean intensity of the decoded bitmap.  Raises
    NotImplementedError when Pillow is absent, marking the integration
    point without faking a result."""
    try:
        import io

        from PIL import Image
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "Pillow is not installed in this environment; pass "
            "decode_fn=fake_decode for the deterministic stand-in"
        ) from e
    img = Image.open(io.BytesIO(payload))
    gray = np.asarray(img.convert("L"), dtype=np.float64)
    return {
        "width": int(img.width),
        "height": int(img.height),
        "mean_intensity": float(gray.mean() / 255.0),
    }


def decode_media(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decode_fn: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """(id, width, height, mean_intensity): per-payload decoded metadata.

    ``decode_fn=None`` selects the real Pillow codec path (lazy import
    executor-side; raises NotImplementedError where the library is
    absent).  Pass ``fake_decode`` for the deterministic no-dependency
    stand-in the oracle queries use."""
    fn = decode_fn or pil_decode

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = [fn(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(dtype=np.int64),
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "mean_intensity": [f["mean_intensity"] for f in feats],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, schema="id long, width int, height int, mean_intensity double"
    )


def resize_media(
    df: DataFrame,
    out_w: int = 8,
    out_h: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    codec: str = "bytes",
) -> DataFrame:
    """Nearest-neighbor resize: (id, out_w, out_h, checksum of the
    resampled pixels).

    ``codec="bytes"`` (default, no dependencies): the payload is viewed
    as a (h × w) grayscale grid (dims from the stub decoder, pixels =
    payload bytes wrapped mod length) — the stand-in the oracle queries
    pin.  ``codec="pil"``: the payload is decoded with Pillow (lazy
    executor-side import, NotImplementedError when absent — the
    embedder-style gate) and the SAME integer index arithmetic
    resamples the real grayscale bitmap; batch shape and schema are
    identical across codecs."""
    if codec not in ("bytes", "pil"):
        raise ValueError(f"unknown codec {codec!r}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rr = np.arange(out_h)
        cc = np.arange(out_w)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, sums = [], []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p)
                if codec == "pil":
                    try:
                        import io

                        from PIL import Image
                    except ImportError as e:  # pragma: no cover
                        raise NotImplementedError(
                            "Pillow is not installed; use codec='bytes' "
                            "for the deterministic stand-in"
                        ) from e
                    img = Image.open(io.BytesIO(raw))
                    arr2d = np.asarray(img.convert("L"), dtype=np.uint8)
                    h, w = arr2d.shape
                    src_r = rr * h // out_h
                    src_c = cc * w // out_w
                    sample = arr2d[src_r[:, None], src_c[None, :]]
                else:
                    n = max(len(raw), 1)
                    dg = hashlib.md5(raw).digest()
                    w = 16 + dg[0] % 64
                    h = 16 + dg[1] % 64
                    src_r = rr * h // out_h
                    src_c = cc * w // out_w
                    idx = (src_r[:, None] * w + src_c[None, :]) % n
                    arr = np.frombuffer(raw.ljust(1, b"\0"), dtype=np.uint8)
                    sample = arr[idx]
                ids.append(did)
                sums.append(int(sample.sum()))
            yield pd.DataFrame(
                {
                    "id": ids,
                    "out_w": out_w,
                    "out_h": out_h,
                    "checksum": sums,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, schema="id long, out_w int, out_h int, checksum long"
    )


def media_features(
    df: DataFrame,
    n_bins: int = 16,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Feature extraction over the opaque payload: a ``n_bins``-bin byte
    histogram, exploded to (id, bin, count) rows.

    The stand-in for a real per-media feature extractor (color
    histogram, MFCC frame stats...) — swap the byte source for decoded
    samples and the kernel shape is production.  Exploded-rows output
    (not an array column) so downstream joins, aggregations, and the
    value-hash oracle all operate on scalar columns."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        width = 256 // n_bins
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, bins, counts = [], [], []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                hist = np.bincount(arr // width, minlength=n_bins)
                ids.extend([did] * n_bins)
                bins.extend(range(n_bins))
                counts.extend(int(c) for c in hist[:n_bins])
            yield pd.DataFrame({"id": ids, "bin": bins, "n": counts})

    return df.select(id_col, payload_col).mapInPandas(
        kernel, schema="id long, bin int, n long"
    )


def frame_sample(
    df: DataFrame,
    every_n_bytes: int = 32,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled offset with a frame
    fingerprint — the video-pipeline shape (payload → frames) with a
    byte-stride stand-in for an actual demuxer."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, offs, fps = [], [], []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p)
                for off in range(0, len(raw), every_n_bytes):
                    ids.append(did)
                    offs.append(off)
                    chunk = raw[off : off + every_n_bytes]
                    fps.append(
                        int.from_bytes(
                            hashlib.md5(chunk).digest()[:7], "big"
                        )
                    )
            if ids:
                yield pd.DataFrame({"id": ids, "frame_offset": offs, "frame_fp": fps})

    return df.select(id_col, payload_col).mapInPandas(
        kernel, schema="id long, frame_offset int, frame_fp long"
    )


def _stub_pixels(payload: bytes, side: int = 9) -> np.ndarray:
    """Deterministic locality-preserving stand-in for a decoded
    grayscale bitmap: payload bytes tiled row-major into a (side x
    side+1) array — near-identical payloads give near-identical
    "pixels", so perceptual-hash semantics are exercised for real even
    without a codec library."""
    need = side * (side + 1)
    if not payload:
        # empty payloads (the corpus schema allows empty text) map to a
        # flat zero grid -> dhash 0, instead of a reshape crash
        return np.zeros((side, side + 1), dtype=np.float64)
    buf = (payload * (need // len(payload) + 1))[:need]
    return np.frombuffer(bytes(buf), dtype=np.uint8).reshape(side, side + 1).astype(
        np.float64
    )


def _pil_pixels(payload: bytes, side: int = 9) -> np.ndarray:
    """Real decode branch: Pillow -> grayscale -> (side x side+1)
    resize.  NotImplementedError without Pillow (same gate as
    pil_decode)."""
    try:
        import io

        from PIL import Image
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "Pillow is not installed in this environment; use the "
            "deterministic byte stand-in (pixels_fn=None default)"
        ) from e
    img = Image.open(io.BytesIO(payload)).convert("L").resize((side + 1, side))
    return np.asarray(img, dtype=np.float64)


_DHASH_POWERS = np.int64(1) << np.arange(62, -1, -1, dtype=np.int64)


def _dhash_bits(px: np.ndarray) -> np.ndarray:
    """The 63 difference-hash bits of one pixel grid (bit j = pixel
    brighter than its right neighbor) — the single packing both the
    per-payload and per-frame hashes use, so they can never drift."""
    return (px[:, :-1] > px[:, 1:]).reshape(-1)[:63]


def dhash(
    df: DataFrame,
    pixels_fn: Callable[[bytes], np.ndarray] | None = None,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, dhash): 63-bit difference hash of each payload's bitmap —
    the classic perceptual image fingerprint (bit j = pixel brighter
    than its right neighbor on a 9x10 grid; robust to rescaling and
    small edits, unlike byte-level hashes).

    ``pixels_fn=None`` uses the deterministic byte stand-in;
    ``pixels_fn=_pil_pixels`` decodes real bitmaps (env-gated).  One
    Arrow pass; the hash lands in a plain long column so the generic
    Hamming band join (``hamming_near_dup_pairs``) composes directly.
    """
    fn = pixels_fn or _stub_pixels

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            bits = np.stack(
                [_dhash_bits(fn(bytes(payload))) for payload in pdf[payload_col]]
            )
            # one batch matmul packs the 63-bit fingerprints (long-safe)
            out = bits.astype(np.int64) @ _DHASH_POWERS
            yield pd.DataFrame(
                {"id": pdf[id_col].astype("int64"), "dhash": out}
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, schema="id long, dhash long"
    )


def _hamming_band_candidates(
    df: DataFrame,
    max_hamming: int,
    bits: int,
    id_col: str,
    hash_col: str,
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Candidate pairs (…extra_keys, a < b, _ha, _hb) sharing at least
    one pigeonhole band chunk (and every ``extra_keys`` column) — the
    simhash band trick (operators/dedup.py): split the fingerprint into
    ``max_hamming + 1`` chunks; two fingerprints within the bound must
    agree on at least one whole chunk.  One equi-join shuffle, never an
    all-pairs join; shared by the flat pair form and the per-frame
    video form so a band fix lands in both."""
    sel = [F.col(k) for k in extra_keys] + [
        F.col(id_col).alias("id"),
        F.col(hash_col).alias("h"),
    ]
    sh = df.select(*sel)
    n_bands = max_hamming + 1
    widths = [
        bits // n_bands + (1 if i < bits % n_bands else 0) for i in range(n_bands)
    ]
    offs = [sum(widths[:i]) for i in range(n_bands)]
    bands = sh.select(
        *extra_keys,
        "id",
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("h"), offs[i])
                        .bitwiseAND(F.lit((1 << widths[i]) - 1))
                        .alias("chunk"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bc"),
    ).select(
        *extra_keys,
        "id",
        "h",
        F.col("bc.band").alias("band"),
        F.col("bc.chunk").alias("chunk"),
    )
    join_keys = list(extra_keys) + ["band", "chunk"]
    return (
        bands.alias("x")
        .join(bands.alias("y"), join_keys)
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            *extra_keys,
            F.col("x.id").alias("a"),
            F.col("y.id").alias("b"),
            F.col("x.h").alias("_ha"),
            F.col("y.h").alias("_hb"),
        )
        .distinct()
    )


def hamming_near_dup_pairs(
    hashes: DataFrame,
    max_hamming: int = 4,
    bits: int = 63,
    id_col: str = "id",
    hash_col: str = "dhash",
) -> DataFrame:
    """Pairs (a < b, hamming) of rows whose integer fingerprints differ
    in at most ``max_hamming`` bits: band candidates
    (``_hamming_band_candidates``) verified with ``bit_count(a XOR b)``.
    Sub-quadratic; one band shuffle + candidate verify."""
    cand = _hamming_band_candidates(hashes, max_hamming, bits, id_col, hash_col)
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))).cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def frame_dhash(
    df: DataFrame,
    every_n_bytes: int = 48,
    pixels_fn: Callable[[bytes], np.ndarray] | None = None,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, frame_idx, dhash): the 63-bit difference hash of every
    sampled frame of a video payload — ``frame_sample``'s fixed-stride
    chunking composed with ``dhash``'s perceptual fingerprint in one
    Arrow pass.  ``pixels_fn=None`` uses the deterministic byte
    stand-in (SQL-reproducible); a real pipeline swaps in a codec
    frame extractor with the identical batch shape.  Empty payloads
    contribute no frames."""
    fn = pixels_fn or _stub_pixels

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p)
                for fi, off in enumerate(range(0, len(raw), every_n_bytes)):
                    bits = _dhash_bits(fn(raw[off : off + every_n_bytes]))
                    ids.append(did)
                    idxs.append(fi)
                    hashes.append(int(bits.astype(np.int64) @ _DHASH_POWERS))
            if ids:
                yield pd.DataFrame(
                    {"id": ids, "frame_idx": idxs, "dhash": hashes}
                )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, schema="id long, frame_idx int, dhash long"
    )


def video_near_dup_pairs(
    frames: DataFrame,
    max_hamming: int = 4,
    min_matched_frames: int = 3,
    bits: int = 63,
) -> DataFrame:
    """Video-level near-dup by frame vote: pairs (a < b, n_matched) of
    videos with at least ``min_matched_frames`` frame positions whose
    per-frame dhashes differ by at most ``max_hamming`` bits.

    Scale shape: per-frame candidates come from the shared pigeonhole
    band join (``_hamming_band_candidates``) keyed by
    (frame_idx, band, chunk) — one equi-join shuffle, never an
    all-pairs join across videos — followed by a popcount verify on
    candidates and one map-side-combinable groupBy vote."""
    sh = frames.select("id", "frame_idx", F.col("dhash").alias("dhash"))
    cand = _hamming_band_candidates(
        sh, max_hamming, bits, "id", "dhash", extra_keys=("frame_idx",)
    )
    matched = cand.filter(
        F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))) <= max_hamming
    )
    return (
        matched.groupBy("a", "b")
        .agg(F.count_distinct("frame_idx").cast("long").alias("n_matched"))
        .filter(F.col("n_matched") >= min_matched_frames)
        .select("a", "b", "n_matched")
    )


def _stub_pcm(payload: bytes) -> np.ndarray:
    """Deterministic PCM stand-in: payload bytes as int64 sample values
    — the audio analogue of ``_stub_pixels`` (SQL twin:
    ``unicode(substr(text, i, 1))`` per position), so the whole
    fingerprint pipeline is oracle-reproducible without a codec.

    ASCII-only contract (shared with the image/video stubs): the stub
    reads UTF-8 OCTETS while the SQL twin reads per-character
    CODEPOINTS, which coincide exactly on ASCII text (every gate
    corpus) and diverge on multi-byte characters — in both sample
    count and values.  The stand-ins exist to oracle-check the
    Spark-side plumbing, not to model text; real audio goes through
    ``_wav_pcm``, which never sees this contract."""
    return np.frombuffer(payload, dtype=np.uint8).astype(np.int64)


def _wav_pcm(payload: bytes) -> np.ndarray:
    """Real decode branch: stdlib ``wave`` → int16 mono PCM samples
    (first channel of multi-channel files).  Unlike the Pillow branch
    this needs no third-party library, so it is exercised by the test
    suite on a synthesized WAV."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        n = w.getnframes()
        width = w.getsampwidth()
        chans = w.getnchannels()
        raw = w.readframes(n)
    if width != 2:
        raise NotImplementedError(
            f"only 16-bit PCM WAV supported (got sample width {width})"
        )
    samples = np.frombuffer(raw, dtype="<i2").astype(np.int64)
    return samples[::chans] if chans > 1 else samples


# 64 bands x band_samples per frame -> 63 adjacent-band energy bits,
# packed with the shared 63-bit powers so the generic Hamming band
# join composes unchanged
_AUDIO_BANDS = 64


def audio_fingerprint(
    df: DataFrame,
    frame_samples: int = 192,
    pcm_fn: Callable[[bytes], np.ndarray] | None = None,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, frame_idx, afp): a 63-bit energy-delta fingerprint of every
    fixed-stride frame of an audio payload — the Haitsma-Kalker-style
    acoustic fingerprint scheme reduced to its band-energy comparisons
    (band j's energy > band j+1's), over 64 contiguous sample bands
    per frame.  ``pcm_fn=None`` uses the deterministic byte stand-in
    (SQL-reproducible); ``pcm_fn=_wav_pcm`` decodes real 16-bit WAV
    with the identical batch shape.  Tail frames zero-pad (a missing
    band's energy is 0, matching the SQL twin's coalesce); empty
    payloads contribute no frames.

    Reference scope note: the reference engine has no audio modality;
    this extends the multimodal layer (SURVEY §2 extension set) with
    the third training-data modality alongside image (dhash) and
    video (frame vote)."""
    if frame_samples % _AUDIO_BANDS:
        raise ValueError(
            f"frame_samples must be a multiple of {_AUDIO_BANDS}"
        )
    band = frame_samples // _AUDIO_BANDS
    fn = pcm_fn or _stub_pcm

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, fps = [], [], []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                s = fn(bytes(p))
                if len(s) == 0:
                    continue
                n_frames = -(-len(s) // frame_samples)
                padded = np.zeros(n_frames * frame_samples, dtype=np.int64)
                padded[: len(s)] = s
                e = (
                    (padded * padded)
                    .reshape(n_frames, _AUDIO_BANDS, band)
                    .sum(axis=2)
                )
                bits = (e[:, :-1] > e[:, 1:]).astype(np.int64)
                packed = bits @ _DHASH_POWERS
                ids.extend([did] * n_frames)
                idxs.extend(range(n_frames))
                fps.extend(int(x) for x in packed)
            if ids:
                yield pd.DataFrame(
                    {"id": ids, "frame_idx": idxs, "afp": fps}
                )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, schema="id long, frame_idx int, afp long"
    )


def audio_near_dup_pairs(
    frames: DataFrame,
    max_hamming: int = 2,
    min_matched_frames: int = 1,
    bits: int = 63,
) -> DataFrame:
    """Track-level near-dup by frame vote over acoustic fingerprints:
    the identical sub-quadratic shape as ``video_near_dup_pairs``
    (pigeonhole band join keyed by frame position → popcount verify →
    per-pair frame vote), reused directly on the ``afp`` column."""
    return video_near_dup_pairs(
        frames.select("id", "frame_idx", F.col("afp").alias("dhash")),
        max_hamming=max_hamming,
        min_matched_frames=min_matched_frames,
        bits=bits,
    )
