"""Multimodal (image/audio/video) column plumbing (north star).

Media are opaque `binary` columns plus typed metadata. The Spark-side
plumbing — schemas, partition sizing, mapInPandas batch shapes, UDF
signatures — is real and tested; the actual codec calls are stubbed
behind `Decoder` because the image/audio libraries are not in this
container (a production deployment injects e.g. a Pillow/ffmpeg-backed
Decoder with the same interface). `FakeDecoder` is deterministic so tests
pin exact values.

Scale notes: media rows are large and variable-sized — the loader
repartitions by byte budget (not row count), and mapInPandas streams
Arrow batches so an executor never holds more than
spark.sql.execution.arrow.maxRecordsPerBatch rows of media at once.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),  # images/video
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),  # audio/video
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content_sha256", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


class Decoder:
    """Codec seam. Production injects a real implementation; this base
    raises so a missing codec is an explicit error, not silent garbage."""

    def decode_features(self, kind: str, mime: str, content: bytes, dim: int) -> np.ndarray:
        raise NotImplementedError(
            "no media codec available in this environment; inject a Decoder "
            "(e.g. Pillow/torchaudio-backed) or use FakeDecoder for tests"
        )


@dataclass
class FakeDecoder(Decoder):
    """Deterministic stand-in: features derived from the content digest —
    stable across processes, so distributed results are reproducible."""

    def decode_features(self, kind: str, mime: str, content: bytes, dim: int) -> np.ndarray:
        digest = hashlib.sha256(content or b"").digest()
        raw = np.frombuffer((digest * (dim * 4 // len(digest) + 1))[: dim * 4], dtype=np.uint32)
        return (raw / np.float64(2**32)).astype(np.float32)


class WavDecoder(Decoder):
    """REAL audio decode for RIFF/WAV PCM bytes using only the stdlib
    (`wave` over an in-memory buffer) — proof the Decoder seam carries an
    actual codec, not just the deterministic fake. decode_features returns
    [duration_s, sample_rate, n_channels, rms] zero-padded to dim."""

    def decode_wav_stats(self, content: bytes) -> tuple[int, int, int]:
        """(sample_rate, n_channels, duration_ms) parsed from the header;
        duration uses exact integer math (frames*1000 // rate) so an SQL
        oracle reproduces it bit-for-bit."""
        import io
        import wave

        with wave.open(io.BytesIO(content), "rb") as w:
            rate = w.getframerate()
            ch = w.getnchannels()
            frames = w.getnframes()
        return rate, ch, (frames * 1000) // rate

    def decode_wav_silence(
        self, content: bytes, threshold: int = 16384
    ) -> tuple[int, int]:
        """(n_samples, n_silent): silence = |sample| < threshold over the
        decoded 16-bit PCM — the VAD-style gate speech pipelines run
        before feature extraction. Pure integer comparisons so an SQL
        oracle that reconstructs the PCM source reproduces it exactly."""
        import io
        import wave

        with wave.open(io.BytesIO(content), "rb") as w:
            pcm = w.readframes(w.getnframes())
        n = len(pcm) // 2
        silent = 0
        for i in range(n):
            s16 = int.from_bytes(pcm[2 * i : 2 * i + 2], "little", signed=True)
            if -threshold < s16 < threshold:
                silent += 1
        return n, silent

    def decode_features(self, kind: str, mime: str, content: bytes, dim: int) -> np.ndarray:
        import io
        import wave

        with wave.open(io.BytesIO(content or b""), "rb") as w:
            rate = w.getframerate()
            ch = w.getnchannels()
            frames = w.getnframes()
            pcm = np.frombuffer(w.readframes(frames), dtype="<i2")
        rms = float(np.sqrt(np.mean((pcm / 32768.0) ** 2))) if pcm.size else 0.0
        head = np.array([frames / rate if rate else 0.0, rate, ch, rms], dtype=np.float32)
        out = np.zeros(dim, dtype=np.float32)
        out[: min(dim, head.size)] = head[:dim]
        return out


class PpmDecoder(Decoder):
    """REAL image decode for binary PPM (P6) bytes using only the stdlib —
    the image-modality counterpart of WavDecoder. P6 layout: ASCII header
    ``P6 <width> <height> <maxval>`` (whitespace/comment separated),
    then width*height*3 raw RGB bytes."""

    def decode_ppm_stats(self, content: bytes) -> tuple[int, int, int]:
        """(width, height, pixel_byte_sum) from a real header parse +
        full-raster read; integer-exact so an SQL oracle reproduces it."""
        width, height, _maxval, body = self._parse(content)
        need = width * height * 3
        if len(body) < need:
            raise ValueError(f"PPM truncated: want {need} bytes, have {len(body)}")
        return width, height, int(sum(body[:need]))

    def decode_ppm_raster(self, content: bytes) -> tuple[int, int, np.ndarray]:
        """(width, height, raster) where raster is the full (h, w, 3)
        uint8 RGB array — the entry point for patch/crop/resize ops that
        need pixels, not just summary stats."""
        width, height, _maxval, body = self._parse(content)
        need = width * height * 3
        if len(body) < need:
            raise ValueError(f"PPM truncated: want {need} bytes, have {len(body)}")
        return width, height, np.frombuffer(body[:need], dtype=np.uint8).reshape(
            height, width, 3
        )

    def decode_features(self, kind: str, mime: str, content: bytes, dim: int) -> np.ndarray:
        width, height, _maxval, body = self._parse(content)
        px = np.frombuffer(body[: width * height * 3], dtype=np.uint8)
        head = np.array(
            [width, height, float(px.mean()) if px.size else 0.0], dtype=np.float32
        )
        out = np.zeros(dim, dtype=np.float32)
        out[: min(dim, head.size)] = head[:dim]
        return out

    @staticmethod
    def _parse(content: bytes) -> tuple[int, int, int, bytes]:
        if not content.startswith(b"P6"):
            raise ValueError("not a P6 PPM")
        # Tokenize the header: three ints after the magic, '#' comments
        # allowed, single whitespace byte terminates the maxval token.
        pos, vals = 2, []
        while len(vals) < 3:
            while pos < len(content) and content[pos : pos + 1].isspace():
                pos += 1
            if content[pos : pos + 1] == b"#":
                while pos < len(content) and content[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(content) and not content[pos : pos + 1].isspace():
                pos += 1
            vals.append(int(content[start:pos]))
        return vals[0], vals[1], vals[2], content[pos + 1 :]


def synth_ppm(width: int, height: int, seed_bytes: bytes) -> bytes:
    """Deterministic binary PPM (P6): a raster whose RGB bytes tile
    seed_bytes — a real, parseable image built from stable inputs."""
    need = width * height * 3
    seed = seed_bytes or b"\x00\x01"
    body = (seed * (need // len(seed) + 1))[:need]
    return f"P6\n{width} {height}\n255\n".encode("ascii") + body


def synth_wav(sample_rate: int, n_channels: int, n_frames: int, seed_bytes: bytes) -> bytes:
    """Deterministic 16-bit PCM WAV: n_frames frames whose samples tile
    seed_bytes — a real, `wave`-readable file built from stable inputs so
    distributed re-execution produces identical media."""
    import io
    import wave

    need = n_frames * n_channels * 2
    seed = seed_bytes or b"\x00\x01"
    pcm = (seed * (need // len(seed) + 1))[:need]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm)
    return buf.getvalue()


def extract_features(
    media: DataFrame, decoder: Decoder, dim: int = 16
) -> DataFrame:
    """Decode/feature-extract via mapInPandas: one Arrow batch of media
    rows in, one batch of fixed-width feature rows out. The decoder rides
    the closure (broadcast once per task)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decoder.decode_features(k, m, c, dim)
                for k, m, c in zip(pdf["kind"], pdf["mime"], pdf["content"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content_sha256": [
                        hashlib.sha256(c or b"").hexdigest() for c in pdf["content"]
                    ],
                    "n_bytes": [len(c or b"") for c in pdf["content"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def repartition_by_bytes(
    media: DataFrame, target_partition_bytes: int = 128 << 20
) -> DataFrame:
    """Size partitions by media bytes, not row count: a fixed row budget
    puts 10 4K-video rows and 10 icon rows in equal partitions and skews
    task runtimes wildly. One total-bytes pass (cheap aggregate on an
    already-loaded column) sets the partition count."""
    total = media.agg(F.sum(F.length("content")).alias("b")).collect()[0].b or 0
    n = max(1, int(total / target_partition_bytes))
    return media.repartition(n)


def frame_sample_stub(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expands each video row into frame
    timestamps (0, every_ms, ... duration_ms) — the real frame decode is
    the Decoder's job; the row expansion + partitioning is Spark's and is
    fully real here (UDTF-style explode, no Python)."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ms",
            F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))),
        )
        .select("media_id", "mime", "frame_ms")
    )
