"""Multimodal columns: binary payloads + typed metadata, Spark-side plumbing.

Images/audio/video ride as opaque ``binary`` columns with a typed metadata
struct; decode / feature-extract / frame-sample run as Arrow-batched
``mapInPandas`` stages. Decoding is REAL for three deterministic
containers that need no external libraries:

* **PPM (P6)** images — ASCII header parse (width/height/maxval) +
  per-channel pixel moments over the raw RGB bytes;
* **WAV (RIFF/PCM16)** audio — chunk walk (fmt + data), sample-rate and
  bit-depth read from the header, RMS over the int16 samples;
* **Y4M (YUV4MPEG2)** video — the uncompressed interchange container
  ffmpeg/x264 consume: header-line token parse (W/H/F/C), per-frame
  ``FRAME`` marker walk, frame count, fps, and mean luma over the Y
  planes.

Payloads in an unrecognized container fall back to byte statistics (the
boundary where PIL/ffmpeg would plug in for JPEG/MP4 at a real deployment);
``require_codecs=True`` makes that fallback an error instead, so a pipeline
that must not silently skip media fails loudly.

All emitted statistics are exact-integer moments divided at the end, so an
ANSI SQL oracle reproduces them bit-for-bit.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, fmt string, n_bytes int, byte_mean double, "
    "byte_std double, head_sha256 string, width int, height int, "
    "mean_r double, mean_g double, mean_b double, "
    "sample_rate int, n_samples int, rms double, "
    "n_frames int, fps double, mean_y double"
)

# Synthetic video: YUV4MPEG2, C444 (three full planes per frame), 2 frames,
# height 2, width 2 + id%2, 25 fps — small enough that two frames fit the
# 64 deterministic body bytes, real enough that ffmpeg would accept it.
_Y4M_FRAMES = 2
_Y4M_H = 2
_Y4M_FPS = 25.0

# Synthetic audio: PCM16 mono @8 kHz, 24 samples (48 data bytes). The RIFF
# header is a fixed 44-byte prefix, precomputed once so both the Spark
# generator and the SQL oracle can concatenate it as a hex constant.
_WAV_N_SAMPLES = 24
_WAV_SAMPLE_RATE = 8000
WAV_HEADER = (
    b"RIFF"
    + struct.pack("<I", 36 + 2 * _WAV_N_SAMPLES)
    + b"WAVE"
    + b"fmt "
    + struct.pack("<IHHIIHH", 16, 1, 1, _WAV_SAMPLE_RATE, 2 * _WAV_SAMPLE_RATE, 2, 16)
    + b"data"
    + struct.pack("<I", 2 * _WAV_N_SAMPLES)
)
WAV_HEADER_HEX = WAV_HEADER.hex()


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL container payloads.

    64 pseudo-bytes per id (two sha256 halves, so an ANSI oracle can
    re-derive them) become:

    * image — a valid binary PPM: ``P6\\n{w} {h}\\n255\\n`` + the first
      w*h*3 bytes as RGB pixels (w = 2 + id%3, h = 2 + id%2);
    * audio — a valid 8 kHz PCM16 WAV: fixed 44-byte RIFF header + the
      first 48 bytes as 24 little-endian samples;
    * video — a valid YUV4MPEG2 (Y4M) stream: header line + 2 ``FRAME``
      chunks of C444 planes (w = 2 + id%2, h = 2) from the body bytes.
    """
    base = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.unhex(
            F.concat(
                F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256),
                F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string"), F.lit("b")), 256),
            )
        ).alias("body"),
        (F.lit(2) + F.pmod(F.col("id"), F.lit(3))).cast("int").alias("w"),
        (F.lit(2) + F.pmod(F.col("id"), F.lit(2))).cast("int").alias("h"),
        (F.lit(2) + F.pmod(F.col("id"), F.lit(2))).cast("int").alias("vw"),
    )
    ppm_header = F.concat(
        F.lit("P6\n"), F.col("w").cast("string"), F.lit(" "),
        F.col("h").cast("string"), F.lit("\n255\n"),
    ).cast("binary")
    img = F.concat(ppm_header, F.substring(F.col("body"), F.lit(1), F.col("w") * F.col("h") * 3))
    wav = F.concat(
        F.unhex(F.lit(WAV_HEADER_HEX)),
        F.substring(F.col("body"), F.lit(1), F.lit(2 * _WAV_N_SAMPLES)),
    )
    y4m_header = F.concat(
        F.lit("YUV4MPEG2 W"), F.col("vw").cast("string"),
        F.lit(f" H{_Y4M_H} F25:1 Ip A1:1 C444\n"),
    ).cast("binary")
    frame_bytes = F.col("vw") * F.lit(3 * _Y4M_H)  # C444: 3 full planes
    y4m = F.concat(
        y4m_header,
        F.lit("FRAME\n").cast("binary"),
        F.substring(F.col("body"), F.lit(1), frame_bytes),
        F.lit("FRAME\n").cast("binary"),
        F.substring(F.col("body"), frame_bytes + 1, frame_bytes),
    )
    payload = (
        F.when(F.col("kind") == "image", img)
        .when(F.col("kind") == "audio", wav)
        .otherwise(y4m)
    )
    mime = (
        F.when(F.col("kind") == "image", F.lit("image/x-portable-pixmap"))
        .when(F.col("kind") == "audio", F.lit("audio/wav"))
        .otherwise(F.lit("video/x-yuv4mpeg"))
    )
    return base.select(
        "media_id",
        "kind",
        payload.alias("payload"),
        F.struct(
            mime.alias("mime"),
            F.when(F.col("kind") == "image", F.col("w")).alias("width"),
            F.when(F.col("kind") == "image", F.col("h")).alias("height"),
            F.when(
                F.col("kind") == "audio",
                F.lit(_WAV_N_SAMPLES * 1000 // _WAV_SAMPLE_RATE).cast("long"),
            )
            .otherwise((F.col("media_id") * 100).cast("long"))
            .alias("duration_ms"),
        ).alias("meta"),
    )


def _decode_ppm(b: bytes):
    """Binary PPM (P6) decode: header parse + per-channel exact moments."""
    import re

    import numpy as np

    m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", b)
    if not m:
        return None
    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    need = w * h * 3
    if maxval != 255 or len(b) - m.end() < need:
        return None
    px = np.frombuffer(b, dtype=np.uint8, count=need, offset=m.end()).reshape(h, w, 3)
    npix = w * h
    sums = px.astype(np.int64).sum(axis=(0, 1))  # exact per-channel sums
    return {
        "fmt": "ppm",
        "width": w,
        "height": h,
        "mean_r": int(sums[0]) / npix,
        "mean_g": int(sums[1]) / npix,
        "mean_b": int(sums[2]) / npix,
    }


def _decode_wav(b: bytes):
    """RIFF/WAVE decode: chunk walk for fmt + data, RMS over PCM16 samples."""
    import math

    import numpy as np

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, rate, bits, channels, data = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        if cid == b"fmt " and size >= 16:
            _fmt, channels, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", b, pos + 8)
        elif cid == b"data":
            data = b[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    if rate is None or data is None or bits != 16 or channels != 1:
        return None
    samples = np.frombuffer(data, dtype="<i2")
    n = len(samples)
    s2 = int((samples.astype(np.int64) ** 2).sum())  # exact
    return {
        "fmt": "wav",
        "sample_rate": int(rate),
        "n_samples": n,
        "rms": math.sqrt(s2 / n) if n else 0.0,
    }


def _decode_y4m(b: bytes):
    """YUV4MPEG2 decode: header-line token parse (W/H/F/C) + FRAME chunk
    walk; mean luma over the Y planes of all frames (exact int sum)."""
    import numpy as np

    if not b.startswith(b"YUV4MPEG2"):
        return None
    nl = b.find(b"\n")
    if nl < 0:
        return None
    w = h = None
    fps_num, fps_den, c = None, 1, "420"
    for tok in b[10:nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        try:
            if tag == b"W":
                w = int(val)
            elif tag == b"H":
                h = int(val)
            elif tag == b"F":
                num, _, den = val.partition(b":")
                fps_num, fps_den = int(num), int(den or b"1")
            elif tag == b"C":
                c = val.decode()
        except ValueError:
            return None
    if not w or not h:
        return None
    if c.startswith("444"):
        frame_len = 3 * w * h
    elif c.startswith("422"):
        frame_len = 2 * w * h
    elif c.startswith("420"):
        frame_len = w * h * 3 // 2
    else:
        return None
    pos, n_frames, y_sum, y_cnt = nl + 1, 0, 0, 0
    while pos < len(b):
        if b[pos:pos + 5] != b"FRAME":
            return None
        fnl = b.find(b"\n", pos)
        if fnl < 0 or len(b) - (fnl + 1) < frame_len:
            return None
        y = np.frombuffer(b, dtype=np.uint8, count=w * h, offset=fnl + 1)
        y_sum += int(y.astype(np.int64).sum())
        y_cnt += w * h
        n_frames += 1
        pos = fnl + 1 + frame_len
    if n_frames == 0:
        return None
    return {
        "fmt": "y4m",
        "width": w,
        "height": h,
        "n_frames": n_frames,
        "fps": fps_num / fps_den,
        "mean_y": y_sum / y_cnt,
    }


def extract_features(media: DataFrame, require_codecs: bool = False, batch_hint: int | None = None) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches of rows).

    PPM, WAV, and Y4M payloads are genuinely decoded (header parse +
    pixel/sample/luma moments); anything else falls back to whole-payload byte statistics
    with ``fmt='raw'`` — unless ``require_codecs=True``, which raises for
    undecodable payloads instead (the honest gate where PIL/ffmpeg would
    extend the decoder registry). One output row per input row; typed
    schema; partitioning preserved.
    """

    def extract(batches):
        import hashlib
        import math

        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows: dict[str, list] = {
                k: [] for k in (
                    "fmt", "n_bytes", "byte_mean", "byte_std", "head_sha256",
                    "width", "height", "mean_r", "mean_g", "mean_b",
                    "sample_rate", "n_samples", "rms", "n_frames", "fps", "mean_y",
                )
            }
            for p in pdf["payload"]:
                p = bytes(p or b"")
                decoded = _decode_ppm(p) or _decode_wav(p) or _decode_y4m(p)
                if decoded is None and require_codecs:
                    raise NotImplementedError(
                        f"payload in unrecognized container (head={p[:8]!r}); "
                        "no codec available — extend the decoder registry "
                        "(PIL/ffmpeg) or drop require_codecs"
                    )
                d = decoded or {"fmt": "raw"}
                arr = np.frombuffer(p, dtype=np.uint8)
                n = len(arr)
                s1 = int(arr.sum())
                s2 = int((arr.astype(np.int64) ** 2).sum())
                m = s1 / n if n else 0.0
                rows["fmt"].append(d["fmt"])
                rows["n_bytes"].append(n)
                rows["byte_mean"].append(m)
                rows["byte_std"].append(math.sqrt(max(s2 / n - m * m, 0.0)) if n else 0.0)
                rows["head_sha256"].append(hashlib.sha256(p[:32].hex().encode()).hexdigest())
                for k in ("width", "height", "mean_r", "mean_g", "mean_b",
                          "sample_rate", "n_samples", "rms", "n_frames", "fps", "mean_y"):
                    rows[k].append(d.get(k))
            out = {"media_id": pdf["media_id"], "kind": pdf["kind"]}
            out.update(rows)
            out["n_bytes"] = pd.array(out["n_bytes"], dtype="int32")
            out["width"] = pd.array(out["width"], dtype="Int32")
            out["height"] = pd.array(out["height"], dtype="Int32")
            out["sample_rate"] = pd.array(out["sample_rate"], dtype="Int32")
            out["n_samples"] = pd.array(out["n_samples"], dtype="Int32")
            out["n_frames"] = pd.array(out["n_frames"], dtype="Int32")
            yield pd.DataFrame(out)

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media, frame_ts) — the
    distributed exploded work-list a real decoder would consume. Pure
    JVM (sequence + explode), no Python."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
