"""Binary/image sources + transforms (reference io/split1 +
image/ImageTransformerSuite strategy: tiny deterministic images)."""

import io
import struct
import zipfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from mmlspark_spark.sources import (
    DecodeImage,
    ImageSetAugmenter,
    ImageTransformer,
    ResizeImageTransformer,
    UnrollImage,
    read_binary_files,
    read_images,
    zip_expand,
)
from mmlspark_spark.sources.image import decode_bmp, image_to_array


def make_bmp(arr: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bit BMP encoder (BGR input)."""
    h, w = arr.shape[:2]
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = b"BM" + struct.pack("<IHHI", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        row = arr[y].astype(np.uint8).tobytes()
        rows.append(row + b"\x00" * (row_size - len(row)))
    return header + info + b"".join(rows)


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(3):
        arr = rng.integers(0, 256, size=(8, 6, 3), dtype=np.uint8)
        (d / f"img{i}.bmp").write_bytes(make_bmp(arr))
    (d / "notes.txt").write_bytes(b"not an image")
    return str(d)


def test_bmp_roundtrip():
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    back = decode_bmp(make_bmp(arr))
    assert np.array_equal(back, arr)


def test_read_binary_files(spark, img_dir):
    df = read_binary_files(spark, img_dir)
    rows = df.collect()
    assert len(rows) == 4
    assert all(len(r.bytes) > 0 for r in rows)
    # glob filter prunes at the scan
    only_bmp = read_binary_files(spark, img_dir, path_glob_filter="*.bmp")
    assert only_bmp.count() == 3


def test_write_binary_files_roundtrip(spark, tmp_path):
    from mmlspark_spark.sources.binary import write_binary_files

    src = spark.createDataFrame(
        [("x/a.bin", bytearray(b"alpha")), ("y/b.bin", bytearray(b"beta"))],
        "path string, bytes binary")
    out = str(tmp_path / "sink")
    write_binary_files(src, out)
    back = read_binary_files(spark, out)
    got = {r.path.rsplit("/", 1)[-1]: bytes(r.bytes) for r in back.collect()}
    assert got == {"a.bin": b"alpha", "b.bin": b"beta"}


def test_zip_expand(spark, tmp_path):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("a.txt", b"alpha")
        zf.writestr("sub/b.txt", b"beta")
    (tmp_path / "arch.zip").write_bytes(buf.getvalue())
    (tmp_path / "plain.bin").write_bytes(b"plain")
    df = zip_expand(read_binary_files(spark, str(tmp_path)))
    got = {r.path.split("/")[-1] if "#" not in r.path
           else r.path.split("#")[-1]: bytes(r.bytes) for r in df.collect()}
    assert got["a.txt"] == b"alpha"
    assert got["sub/b.txt" if "sub/b.txt" in got else "b.txt"] == b"beta"
    assert got["plain.bin"] == b"plain"


def test_decode_image_stage(spark, img_dir):
    df = read_binary_files(spark, img_dir, path_glob_filter="*.bmp")
    out = DecodeImage(pathCol="path", bytesCol="bytes",
                      outputCol="image").transform(df)
    rows = out.collect()
    assert len(rows) == 3
    for r in rows:
        assert r.image.height == 8 and r.image.width == 6
        assert r.image.nChannels == 3
        assert len(r.image.data) == 8 * 6 * 3


def test_builtin_image_source(spark, img_dir):
    df = read_images(spark, img_dir)
    rows = df.collect()
    assert len(rows) == 3  # dropInvalid skips notes.txt
    assert rows[0].image.height == 8


def test_image_transformer_pipeline(spark, img_dir):
    df = DecodeImage().transform(
        read_binary_files(spark, img_dir, path_glob_filter="*.bmp"))
    stage = ImageTransformer(inputCol="image", outputCol="image") \
        .resize(4, 4, method="nearest").gray().threshold(127)
    out = stage.transform(df).collect()
    for r in out:
        img = image_to_array(r.image)
        assert img.shape == (4, 4, 1)
        assert set(np.unique(img)).issubset({0, 255})


def test_resize_and_unroll(spark, img_dir):
    df = DecodeImage().transform(
        read_binary_files(spark, img_dir, path_glob_filter="*.bmp"))
    resized = ResizeImageTransformer(height=3, width=3).transform(df)
    unrolled = UnrollImage(inputCol="image", outputCol="vec",
                           normalize=True).transform(resized)
    rows = unrolled.collect()
    for r in rows:
        assert len(r.vec) == 3 * 3 * 3
        assert all(0.0 <= v <= 1.0 for v in r.vec)


def test_image_set_augmenter_doubles_rows(spark, img_dir):
    df = DecodeImage().transform(
        read_binary_files(spark, img_dir, path_glob_filter="*.bmp"))
    out = ImageSetAugmenter(inputCol="image", outputCol="image",
                            flipLeftRight=True, flipUpDown=True).transform(df)
    assert out.count() == 9  # original + LR + UD
    # flip is an involution: flipping twice returns the original
    once = ImageTransformer(ops=[{"op": "flip", "flipCode": 1}]).transform(df)
    twice = ImageTransformer(ops=[{"op": "flip", "flipCode": 1}]).transform(once)
    a = image_to_array(df.orderBy("path").collect()[0].image)
    b = image_to_array(twice.orderBy("path").collect()[0].image)
    assert np.array_equal(a, b)


def make_wav(freq=440.0, rate=8000, seconds=0.5, channels=1):
    import wave as _wave

    t = np.arange(int(rate * seconds)) / rate
    pcm = (np.sin(2 * np.pi * freq * t) * 20000).astype(np.int16)
    if channels == 2:
        pcm = np.column_stack([pcm, pcm]).ravel()
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def test_decode_audio_and_features(spark, tmp_path):
    from mmlspark_spark.sources.multimodal import AudioFeatures, DecodeAudio

    (tmp_path / "tone.wav").write_bytes(make_wav())
    (tmp_path / "stereo.wav").write_bytes(make_wav(channels=2))
    (tmp_path / "junk.bin").write_bytes(b"not audio at all")
    df = read_binary_files(spark, str(tmp_path))
    decoded = DecodeAudio().transform(df)
    rows = {r.path.split("/")[-1]: r.audio for r in decoded.collect()}
    assert rows["junk.bin"] is None  # fault-tolerant
    assert rows["tone.wav"].sampleRate == 8000
    assert rows["tone.wav"].numSamples == 4000
    assert rows["stereo.wav"].channels == 2

    feats = AudioFeatures(frameSize=1000).transform(decoded)
    frow = {r.path.split("/")[-1]: r.features for r in feats.collect()}
    f = frow["tone.wav"]
    assert abs(f.duration_sec - 0.5) < 1e-9
    assert len(f.rms) == 4
    # 440 Hz sine at 20000 amplitude: rms ~ 20000/32768/sqrt(2) ~ 0.43
    assert all(0.3 < v < 0.5 for v in f.rms)
    # zcr of a 440 Hz tone at 8 kHz ~ 2*440/8000 = 0.11
    assert all(0.08 < v < 0.14 for v in f.zcr)


def test_video_frame_sample_plumbing(spark, tmp_path):
    from mmlspark_spark.sources.multimodal import DecodeVideoFrames

    try:
        import cv2  # noqa: F401
        have_cv2 = True
    except ImportError:
        have_cv2 = False

    (tmp_path / "clip.fake").write_bytes(b"video-ish bytes")
    df = read_binary_files(spark, str(tmp_path))
    stage = DecodeVideoFrames(numFrames=3, height=8, width=8)
    out = stage.transform(df)
    assert stage.transform_schema(df.schema).fieldNames() == \
        out.schema.fieldNames()
    row = out.collect()[0].video
    if have_cv2:
        # real decoder on garbage bytes: fault-tolerant zero frames
        assert row.numFrames == 0 and row.frames == []
        return
    assert row.numFrames == 3
    assert len(row.frames) == 3
    assert row.frames[0].height == 8 and row.frames[0].nChannels == 3
    # deterministic fake: same content → same frames
    row2 = stage.transform(df).collect()[0].video
    assert bytes(row.frames[0].data) == bytes(row2.frames[0].data)


def test_video_real_decode_cv2(spark, tmp_path):
    """Real path: a tiny generated .avi decodes to VIDEO_FRAMES_SCHEMA
    with evenly-sampled, resized BGR frames. Skipped where cv2 is
    absent (this container) — the fake-path test above still runs."""
    cv2 = pytest.importorskip("cv2")
    import numpy as np

    from mmlspark_spark.sources.multimodal import DecodeVideoFrames

    path = str(tmp_path / "clip.avi")
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 5,
                         (16, 16))
    for i in range(10):  # frame i has constant intensity 20*i
        wr.write(np.full((16, 16, 3), 20 * i, dtype=np.uint8))
    wr.release()

    df = read_binary_files(spark, str(tmp_path))
    out = DecodeVideoFrames(numFrames=4, height=8, width=8).transform(df)
    row = out.collect()[0].video
    assert row.numFrames == 4
    assert row.width == 8 and row.height == 8
    assert all(f.height == 8 and f.width == 8 and f.nChannels == 3
               for f in row.frames)
    # evenly sampled: first frame dark, last frame bright
    first = np.frombuffer(bytes(row.frames[0].data), dtype=np.uint8)
    last = np.frombuffer(bytes(row.frames[-1].data), dtype=np.uint8)
    assert first.mean() < 40 and last.mean() > 140


def test_spectrogram_peak_bin_and_mel(spark, tmp_path):
    """The STFT must put a 1 kHz tone's energy in the right FFT bin
    (1000/8000*512 = 64), the log-mel projection must peak in the band
    whose center covers 1 kHz, and short/null audio must degrade
    gracefully."""
    import numpy as np

    from mmlspark_spark.sources.multimodal import (
        DecodeAudio,
        Spectrogram,
        mel_filterbank,
    )

    (tmp_path / "tone1k.wav").write_bytes(make_wav(freq=1000.0))
    (tmp_path / "junk.bin").write_bytes(b"xx")
    df = read_binary_files(spark, str(tmp_path))
    decoded = DecodeAudio().transform(df)

    spec = Spectrogram(frameSize=512, hopSize=256).transform(decoded)
    rows = {r.path.split("/")[-1]: r.spectrogram for r in spec.collect()}
    assert rows["junk.bin"] is None  # null audio -> null spectrogram
    s = rows["tone1k.wav"]
    assert s.numBins == 257  # 512//2 + 1
    # 0.5 s at 8 kHz, frame 512 hop 256 -> (4000-512)//256 + 1 = 14
    assert s.numFrames == 14
    mean_spec = np.mean(np.array(s.data), axis=0)
    assert int(np.argmax(mean_spec)) == 64  # 1000/8000*512

    mel = Spectrogram(frameSize=512, hopSize=256,
                      melBands=20).transform(decoded)
    m = {r.path.split("/")[-1]: r.spectrogram
         for r in mel.collect()}["tone1k.wav"]
    assert m.numBins == 20
    peak_band = int(np.argmax(np.mean(np.array(m.data), axis=0)))
    fb = mel_filterbank(20, 512, 8000)
    assert fb[peak_band, 64] > 0  # the winning band covers bin 64

    # filterbank shape contracts
    assert fb.shape == (20, 257)
    assert np.all(fb >= 0) and np.isclose(fb.max(), 1.0)


def _mk_warc_record(uri, payload: bytes, rtype="response",
                    http=True, rid="<urn:uuid:test-1>",
                    date="2026-08-16T00:00:00Z"):
    if http:
        body = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + payload)
    else:
        body = payload
    hdr = (f"WARC/1.0\r\n"
           f"WARC-Type: {rtype}\r\n"
           f"WARC-Record-ID: {rid}\r\n"
           f"WARC-Date: {date}\r\n"
           f"WARC-Target-URI: {uri}\r\n"
           f"Content-Type: application/http; msgtype=response\r\n"
           f"Content-Length: {len(body)}\r\n\r\n").encode()
    return hdr + body + b"\r\n\r\n"


def test_read_warc_plain_and_gzip_members(spark, tmp_path):
    """read_warc parses WARC/1.0 records (HTTP envelope peeled,
    status surfaced), filters to the requested record types, and
    reads Common-Crawl-style CONCATENATED per-record gzip members;
    a truncated final member salvages every complete record before
    it (the fault-tolerant decode contract)."""
    import gzip

    from mmlspark_spark.sources import read_warc

    rec1 = _mk_warc_record("http://a.example/x",
                           "hello <b>world</b> é".encode())
    rec2 = _mk_warc_record("http://b.example/y", b"second page body")
    info = _mk_warc_record(None, b"software: test", rtype="warcinfo",
                           http=False)
    plain = tmp_path / "seg-00000.warc"
    plain.write_bytes(info + rec1 + rec2)

    out = read_warc(spark, str(plain), payloadAsText=True)
    rows = {r.target_uri: r for r in out.collect()}
    assert set(rows) == {"http://a.example/x", "http://b.example/y"}
    a = rows["http://a.example/x"]
    assert a.warc_type == "response"
    assert a.http_status == 200
    assert a.text == "hello <b>world</b> é"
    assert bytes(a.payload) == "hello <b>world</b> é".encode()
    assert a.warc_date == "2026-08-16T00:00:00Z"

    # warcinfo kept when recordTypes=None, envelope untouched for
    # non-HTTP blocks
    allrec = read_warc(spark, str(plain), recordTypes=None)
    assert sorted(r.warc_type for r in allrec.collect()) \
        == ["response", "response", "warcinfo"]

    # gzip: one member per record (the .warc.gz convention), plus a
    # truncated garbage tail — complete records still come back
    gz = tmp_path / "seg-00001.warc.gz"
    gz.write_bytes(gzip.compress(rec1) + gzip.compress(rec2)
                   + b"\x1f\x8b\x08\x00garbage-truncated")
    got = read_warc(spark, str(gz))
    assert sorted(r.target_uri for r in got.collect()) \
        == ["http://a.example/x", "http://b.example/y"]


def test_read_warc_refuses_oversized_segment_fast(spark, tmp_path):
    """The segment-size contract (round-16): a segment above the
    2 GiB binaryFile cap fails at PLAN time with the offending file
    named and split advice, instead of an opaque task-time JVM error.
    The oversized file is sparse (truncate, no bytes written), so the
    test costs nothing; a directory of in-bound segments passes the
    pre-scan untouched."""
    import pytest as _pytest

    from mmlspark_spark.sources import read_warc
    from mmlspark_spark.sources.warc import _refuse_oversized_segments

    src = tmp_path / "oversized"
    src.mkdir()
    ok = src / "small.warc"
    ok.write_bytes(b"WARC/1.0\r\n\r\n")
    big = src / "huge.warc.gz"
    with open(big, "wb") as fh:
        fh.truncate((1 << 31) + 10)  # sparse: size without bytes

    with _pytest.raises(ValueError, match="huge.warc.gz"):
        read_warc(spark, str(src))
    with _pytest.raises(ValueError, match="2 GiB"):
        read_warc(spark, str(src))

    big.unlink()
    # in-bound segments pass the pre-scan (and the stream variant
    # checks files present at start through the same helper)
    _refuse_oversized_segments(spark, str(src), True, None)
    assert read_warc(spark, str(src)).count() == 0  # header-only file


def test_warc_round_trip(spark, tmp_path):
    """write_warc re-publishes curated rows as conformant WARC.gz
    ``resource`` records (bare-payload block, ISO 28500 §6.5 — NOT
    ``response``, whose block must be an application/http message)
    that read_warc (and by construction any WARC tool) reads back:
    uri/date/payload survive byte-exact — INCLUDING a payload that
    itself starts with 'HTTP/' and contains CRLFCRLF, because the
    HTTP peel is gated on the record Content-Type declaring
    application/http, never on sniffing payload bytes."""
    from mmlspark_spark.sources import read_warc, write_warc

    rows = [(f"http://site{i}.example/p", f"2026-08-1{i}T00:00:00Z",
             f"document body {i}".encode()) for i in range(4)]
    http_lookalike = b"HTTP/1.1 200 OK\r\nX-A: 1\r\n\r\nnot an envelope"
    rows.append(("http://site9.example/raw-http",
                 "2026-08-16T00:00:00Z", http_lookalike))
    df = spark.createDataFrame(
        rows, "target_uri string, warc_date string, payload binary")
    out_dir = str(tmp_path / "curated_warc")
    write_warc(df.repartition(2), out_dir, dateCol="warc_date")

    back = read_warc(spark, out_dir, pathGlobFilter="*.warc.gz")
    got = {r.target_uri: r for r in back.collect()}
    assert set(got) == {u for u, _, _ in rows}
    for u, d, p in rows:
        assert bytes(got[u].payload) == p
        assert got[u].warc_date == d
        assert got[u].warc_type == "resource"
        assert got[u].http_status is None


def test_read_warc_stream_micro_batches(spark, tmp_path):
    """read_warc_stream: the crawl-arrival entry point — segment
    files landing in a directory become micro-batches of parsed
    records through the SAME Arrow parser as the batch reader
    (identical schema and peel semantics), with exactly-once file
    tracking from the stream checkpoint. Two segments written with
    pinned mtimes arrive as two batches under maxFilesPerTrigger=1;
    a third segment written after the first processAllAvailable is
    picked up incrementally without re-emitting the old records."""
    import gzip
    import os as _os
    import time as _time

    from mmlspark_spark.sources import read_warc_stream

    src = tmp_path / "crawl_in"
    src.mkdir()
    now = _time.time()

    def seg(i, uris_payloads):
        f = src / f"seg-{i:05d}.warc.gz"
        f.write_bytes(b"".join(
            gzip.compress(_mk_warc_record(u, p)) for u, p in
            uris_payloads))
        _os.utime(f, (now + i, now + i))

    seg(0, [("http://a.example/1", b"doc one"),
            ("http://a.example/2", b"doc two")])
    seg(1, [("http://b.example/3", b"doc three")])

    got: dict[int, set] = {}

    def sink(batch_df, bid):
        got[bid] = {(r.target_uri, bytes(r.payload), r.http_status)
                    for r in batch_df.collect()}

    stream = read_warc_stream(spark, str(src), maxFilesPerTrigger=1,
                              pathGlobFilter="*.warc.gz")
    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "warc_ck"))
         .start())
    try:
        q.processAllAvailable()
        assert len(got) == 2
        assert got[0] == {("http://a.example/1", b"doc one", 200),
                          ("http://a.example/2", b"doc two", 200)}
        assert got[1] == {("http://b.example/3", b"doc three", 200)}
        # a third segment arrives later: incremental pickup only
        seg(2, [("http://c.example/4", b"doc four")])
        q.processAllAvailable()
        assert got[2] == {("http://c.example/4", b"doc four", 200)}
        assert len(got) == 3
    finally:
        q.stop()


def test_write_warc_failed_task_leaves_no_partial_archive(spark,
                                                          tmp_path):
    """A task that dies mid-write must leave neither a final archive
    nor a temp file behind (the atomic temp+rename contract): rows
    missing the payload column blow up inside the partition writer;
    the output directory must contain no part-*.warc.gz and no .tmp
    litter afterwards."""
    import os

    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from mmlspark_spark.sources import write_warc

    df = spark.createDataFrame(
        [("http://x.example/1", b"ok")],
        "target_uri string, wrong_col binary")
    out = str(tmp_path / "warc_fail")
    with _pytest.raises(Py4JJavaError):
        write_warc(df, out)  # payloadCol 'payload' missing -> task dies
    leftovers = os.listdir(out) if os.path.isdir(out) else []
    assert leftovers == [], f"partial sink output left behind: {leftovers}"
