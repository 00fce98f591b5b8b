"""Multimodal columns: audio and video as opaque binaries + typed metadata.

The engine treats media as ``binary`` columns flowing through the same
binaryFile scan as images (SURVEY north-star: multimodal training-data
pipelines). Schemas are typed structs; decode / feature-extract /
frame-sample run as Arrow-batched ``mapInPandas`` stages.

Decode reality in this container (no soundfile/librosa/cv2/av):

- audio: PCM WAV decodes for real via the stdlib ``wave`` module;
  other formats fall back to null (fault-tolerant, like image decode);
- video: no codec exists in the stdlib — ``DecodeVideoFrames`` tries
  cv2/av and otherwise produces a clearly-marked DETERMINISTIC FAKE
  (frames seeded from the content hash) so the Spark-side plumbing
  (schema, batching, partition behavior, downstream featurization) is
  real and tested, as the build brief prescribes for absent codecs.
"""

from __future__ import annotations

import hashlib
import io
import wave

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mmlspark_spark.core.base import Transformer
from mmlspark_spark.sources.image import IMAGE_SCHEMA, array_to_image

AUDIO_SCHEMA = T.StructType([
    T.StructField("origin", T.StringType()),
    T.StructField("sampleRate", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("numSamples", T.LongType()),
    T.StructField("data", T.BinaryType()),  # PCM16 interleaved
])

VIDEO_FRAMES_SCHEMA = T.StructType([
    T.StructField("origin", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("numFrames", T.IntegerType()),
    T.StructField("frames", T.ArrayType(IMAGE_SCHEMA)),
])


def decode_wav(blob: bytes):
    """PCM WAV → (sample_rate, channels, int16 array) via stdlib wave."""
    try:
        with wave.open(io.BytesIO(blob)) as w:
            if w.getsampwidth() != 2:
                return None
            frames = w.readframes(w.getnframes())
            pcm = np.frombuffer(frames, dtype=np.int16)
            return w.getframerate(), w.getnchannels(), pcm
    except (wave.Error, EOFError):
        return None


class DecodeAudio(Transformer):
    """(path, bytes) → audio struct; WAV real, other formats null."""

    def __init__(self, pathCol: str = "path", bytesCol: str = "bytes",
                 outputCol: str = "audio"):
        super().__init__(pathCol=pathCol, bytesCol=bytesCol, outputCol=outputCol)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.pathCol, self.bytesCol)
        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, AUDIO_SCHEMA)])

    def _transform(self, df: DataFrame) -> DataFrame:
        path_col, bytes_col, out_col = self.pathCol, self.bytesCol, self.outputCol
        out_schema = T.StructType(list(df.schema.fields)
                                  + [T.StructField(out_col, AUDIO_SCHEMA)])

        def run(it):
            for pdf in it:
                outs = []
                for p, b in zip(pdf[path_col], pdf[bytes_col]):
                    dec = decode_wav(bytes(b))
                    if dec is None:
                        outs.append(None)
                        continue
                    rate, ch, pcm = dec
                    outs.append({
                        "origin": p, "sampleRate": int(rate),
                        "channels": int(ch),
                        "numSamples": int(len(pcm) // ch),
                        "data": pcm.tobytes(),
                    })
                out = pdf.copy()
                out[out_col] = outs
                yield out

        return df.mapInPandas(run, out_schema)


class AudioFeatures(Transformer):
    """Frame-level features over the PCM payload: per-frame RMS energy
    and zero-crossing rate (numpy, vectorized per Arrow batch) — the
    feature-extract slot of the multimodal pipeline."""

    def __init__(self, inputCol: str = "audio", outputCol: str = "features",
                 frameSize: int = 1024):
        super().__init__(inputCol=inputCol, outputCol=outputCol,
                         frameSize=frameSize)

    OUT_T = T.StructType([
        T.StructField("rms", T.ArrayType(T.DoubleType())),
        T.StructField("zcr", T.ArrayType(T.DoubleType())),
        T.StructField("duration_sec", T.DoubleType()),
    ])

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol)
        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, self.OUT_T)])

    def _transform(self, df: DataFrame) -> DataFrame:
        in_col, out_col, frame = self.inputCol, self.outputCol, self.frameSize
        out_schema = T.StructType(list(df.schema.fields)
                                  + [T.StructField(out_col, self.OUT_T)])

        def run(it):
            for pdf in it:
                outs = []
                for a in pdf[in_col]:
                    if a is None:
                        outs.append(None)
                        continue
                    x = _pcm_to_float(a)
                    n = (len(x) // frame) * frame
                    fr = x[:n].reshape(-1, frame)
                    rms = np.sqrt((fr ** 2).mean(axis=1))
                    zcr = (np.diff(np.signbit(fr), axis=1) != 0).mean(axis=1)
                    outs.append({
                        "rms": [float(v) for v in rms],
                        "zcr": [float(v) for v in zcr],
                        "duration_sec": float(len(x) / a["sampleRate"]),
                    })
                out = pdf.copy()
                out[out_col] = outs
                yield out

        return df.mapInPandas(run, out_schema)


def _pcm_to_float(audio) -> np.ndarray:
    """AUDIO_SCHEMA struct → mono float64 in [-1, 1): int16 decode,
    channel mixdown, normalize. Shared by AudioFeatures and
    Spectrogram so the PCM handling has exactly one definition."""
    pcm = np.frombuffer(bytes(audio["data"]), dtype=np.int16)
    if audio["channels"] > 1:  # mixdown
        pcm = pcm.reshape(-1, audio["channels"]).mean(axis=1)
    return pcm.astype(np.float64) / 32768.0


def mel_filterbank(n_mels: int, n_fft: int, sample_rate: int,
                   fmin: float = 0.0) -> np.ndarray:
    """Triangular mel filterbank matrix (n_mels × (n_fft//2 + 1)),
    HTK mel scale ``mel(f) = 2595·log10(1 + f/700)`` — the standard
    public formulation. Pure numpy; rows are unit-peak triangles."""
    fmax = sample_rate / 2.0

    def to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

    def from_mel(m):
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

    pts = from_mel(np.linspace(to_mel(fmin), to_mel(fmax), n_mels + 2))
    bins = np.floor((n_fft + 1) * pts / sample_rate).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for i in range(n_mels):
        lo, ctr, hi = bins[i], bins[i + 1], bins[i + 2]
        for b in range(lo, ctr):  # empty when ctr == lo (degenerate)
            fb[i, b] = (b - lo) / (ctr - lo)
        for b in range(ctr, hi):
            fb[i, b] = (hi - b) / (hi - ctr)
    return fb


class Spectrogram(Transformer):
    """STFT power spectrogram (optionally log-mel) over the decoded
    PCM payload — the speech/audio representation slot of the
    multimodal pipeline, computed FOR REAL with numpy's FFT (no
    external codec or DSP dependency).

    Per document: hann-windowed frames of ``frameSize`` samples every
    ``hopSize``, ``rfft`` → power; ``melBands > 0`` projects onto a
    triangular HTK-mel filterbank and takes log10 (log-mel), else the
    linear power bins are returned. Arrow-batched ``mapInPandas``; a
    100 TB corpus spectrogram job is map-only."""

    OUT_T = T.StructType([
        T.StructField("numFrames", T.IntegerType()),
        T.StructField("numBins", T.IntegerType()),
        T.StructField("data", T.ArrayType(T.ArrayType(T.DoubleType()))),
    ])

    def __init__(self, inputCol: str = "audio",
                 outputCol: str = "spectrogram", frameSize: int = 512,
                 hopSize: int = 256, melBands: int = 0):
        super().__init__(inputCol=inputCol, outputCol=outputCol,
                         frameSize=frameSize, hopSize=hopSize,
                         melBands=melBands)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.inputCol)
        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, self.OUT_T)])

    def _transform(self, df: DataFrame) -> DataFrame:
        in_col, out_col = self.inputCol, self.outputCol
        n_fft, hop, n_mels = self.frameSize, self.hopSize, self.melBands
        out_schema = T.StructType(list(df.schema.fields)
                                  + [T.StructField(out_col, self.OUT_T)])

        def run(it):
            window = np.hanning(n_fft)
            fbs: dict[int, np.ndarray] = {}  # per sampleRate
            for pdf in it:
                outs = []
                for a in pdf[in_col]:
                    if a is None:
                        outs.append(None)
                        continue
                    x = _pcm_to_float(a)
                    if len(x) < n_fft:
                        outs.append({"numFrames": 0,
                                     "numBins": 0, "data": []})
                        continue
                    starts = np.arange(0, len(x) - n_fft + 1, hop)
                    frames = np.stack([x[s:s + n_fft] for s in starts])
                    spec = np.abs(np.fft.rfft(frames * window,
                                              axis=1)) ** 2
                    if n_mels > 0:
                        rate = int(a["sampleRate"])
                        if rate not in fbs:
                            fbs[rate] = mel_filterbank(n_mels, n_fft,
                                                       rate)
                        spec = np.log10(spec @ fbs[rate].T + 1e-10)
                    outs.append({
                        "numFrames": int(spec.shape[0]),
                        "numBins": int(spec.shape[1]),
                        # one C-level conversion, not frames*bins
                        # python float() calls in the hot map path
                        "data": spec.tolist(),
                    })
                out = pdf.copy()
                out[out_col] = outs
                yield out

        return df.mapInPandas(run, out_schema)


def _fake_frames(blob: bytes, num_frames: int, height: int, width: int):
    """DETERMINISTIC FAKE decode: frames seeded by content hash.
    Placeholder for a real codec (cv2/av) — same shapes, same schema."""
    seed = int.from_bytes(hashlib.sha256(blob).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
            for _ in range(num_frames)]


class DecodeVideoFrames(Transformer):
    """(path, bytes) → sampled frames as image structs.

    Real decode via cv2/av when importable; otherwise the deterministic
    fake above (clearly marked). ``numFrames`` evenly samples the clip
    (the frame-sample slot of the multimodal pipeline).
    """

    def __init__(self, pathCol: str = "path", bytesCol: str = "bytes",
                 outputCol: str = "video", numFrames: int = 4,
                 height: int = 32, width: int = 32):
        super().__init__(pathCol=pathCol, bytesCol=bytesCol,
                         outputCol=outputCol, numFrames=numFrames,
                         height=height, width=width)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.pathCol, self.bytesCol)
        return T.StructType(list(schema.fields)
                            + [T.StructField(self.outputCol, VIDEO_FRAMES_SCHEMA)])

    def _transform(self, df: DataFrame) -> DataFrame:
        path_col, bytes_col, out_col = self.pathCol, self.bytesCol, self.outputCol
        n_frames, h, w = self.numFrames, self.height, self.width
        out_schema = T.StructType(list(df.schema.fields)
                                  + [T.StructField(out_col, VIDEO_FRAMES_SCHEMA)])

        def decode(path, blob):
            try:
                import cv2
            except ImportError:
                return _fake_frames(blob, n_frames, h, w)
            import os
            import tempfile

            # cv2.VideoCapture wants a file path; the blob came through
            # the binary scan, so spill it to executor-local tmp.
            suffix = os.path.splitext(path)[1] or ".avi"
            with tempfile.NamedTemporaryFile(suffix=suffix,
                                             delete=False) as f:
                f.write(blob)
                tmp = f.name
            try:
                cap = cv2.VideoCapture(tmp)
                try:
                    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT) or 0)
                    if total <= 0:
                        return []  # fault-tolerant: undecodable → 0 frames
                    idxs = np.linspace(
                        0, total - 1, min(n_frames, total)).astype(int)
                    frames = []
                    for i in idxs:
                        cap.set(cv2.CAP_PROP_POS_FRAMES, int(i))
                        ok, fr = cap.read()
                        if ok:
                            frames.append(cv2.resize(fr, (w, h)))
                    return frames  # BGR uint8, matching IMAGE_SCHEMA
                finally:
                    cap.release()
            finally:
                os.unlink(tmp)

        def run(it):
            for pdf in it:
                outs = []
                for p, b in zip(pdf[path_col], pdf[bytes_col]):
                    frames = decode(p, bytes(b))
                    outs.append({
                        "origin": p, "width": w, "height": h,
                        "numFrames": len(frames),
                        "frames": [array_to_image(fr, origin=f"{p}#frame{i}")
                                   for i, fr in enumerate(frames)],
                    })
                out = pdf.copy()
                out[out_col] = outs
                yield out

        return df.mapInPandas(run, out_schema)
