"""Tests for the streaming QoaDecoder / QoaEncoder facades.

Ports the reference's integration tests: iterator semantics
(src/lib.rs:998-1032), streaming frame decode (src/lib.rs:1034-1066), and
streaming-encode byte equality (src/lib.rs:1262-1297).
"""

import io

import numpy as np
import pytest

from qoaudio_tpu import (
    FixedSamples,
    FrameHeader,
    QoaDecoder,
    QoaDesc,
    QoaEncoder,
    Streaming,
    codec,
)
from qoaudio_tpu import format as fmt
from qoaudio_tpu import reference as ref
from qoaudio_tpu.errors import InvalidSamples, NoSamples, NotQoaFile

from conftest import (
    FIXTURE_FRAMES,
    FIXTURE_LAST_FRAME_SAMPLES,
    FIXTURE_SAMPLES_PER_CHANNEL,
    make_noise,
    make_sine,
)


def test_iterating_through_whole_file(fixture_bytes):
    qoa = QoaDecoder(fixture_bytes)
    assert qoa.mode() == FixedSamples(2, 44100, FIXTURE_SAMPLES_PER_CHANNEL)
    assert qoa.total_duration() == pytest.approx(
        FIXTURE_SAMPLES_PER_CHANNEL / 44100
    )

    frame_headers_seen = 0
    samples_seen = 0
    for item in qoa:
        if isinstance(item, FrameHeader):
            assert item.num_channels == 2
            assert item.sample_rate == 44100
            frame_headers_seen += 1
            if frame_headers_seen < FIXTURE_FRAMES:
                assert item.num_samples_per_channel == 5120
            else:
                assert item.num_samples_per_channel == FIXTURE_LAST_FRAME_SAMPLES
        else:
            samples_seen += 1
            if samples_seen > 25000:
                break  # per-item python iteration is for API parity, not bulk

    # bulk-drain the rest and account for every sample
    rest = qoa.decode_pending()
    assert samples_seen + len(rest) == FIXTURE_SAMPLES_PER_CHANNEL * 2
    # we saw at least the first few frame headers before breaking
    assert frame_headers_seen >= 3


def test_bulk_drain_partial_iteration_bit_exact(fixture_bytes):
    """decode_pending after partial per-item iteration: the bulk-drain
    fast path starts from an ODD _pending remainder (flat samples, not
    channel pairs) and the joined stream must equal decode_all exactly."""
    want = codec.decode_all(fixture_bytes).samples
    dec = QoaDecoder(fixture_bytes)
    seen = []
    for item in dec:
        if not isinstance(item, FrameHeader):
            seen.append(item)
            if len(seen) == 7001:  # odd: splits a stereo sample pair
                break
    rest = dec.decode_pending()
    joined = np.concatenate([np.asarray(seen, np.int16), rest])
    assert np.array_equal(joined, want)


def test_bulk_drain_truncated_stream_defers_error(fixture_bytes):
    """A mid-stream truncation on the bulk-drain path: decode_pending
    yields every decodable sample first, then the NEXT call raises the
    typed error (same deferral as the generic path)."""
    from qoaudio_tpu.errors import QoaError

    cut = fixture_bytes[: len(fixture_bytes) // 2 + 137]
    dec = QoaDecoder(cut)
    got = dec.decode_pending()
    assert len(got) > 0
    want = codec.decode_all(fixture_bytes).samples
    assert np.array_equal(got, want[: len(got)])
    with pytest.raises(QoaError):
        dec.decode_pending()


def test_iterator_sample_values_match_decode_all():
    pcm = make_sine(100, 1)
    data = ref.encode_all_py(pcm, 1, 44100, 100)
    dec = QoaDecoder(data)
    items = list(dec)
    headers = [i for i in items if isinstance(i, FrameHeader)]
    samples = [i for i in items if not isinstance(i, FrameHeader)]
    assert len(headers) == 1
    assert headers[0] == FrameHeader(1, 44100, 100)
    want = codec.decode_all(data).samples
    assert np.array_equal(np.array(samples, dtype=np.int16), want)


def test_decode_streaming_frames(fixture_bytes):
    # feed the first two frames one at a time (reference test,
    # src/lib.rs:1034-1066)
    qoa = QoaDecoder.new_streaming()
    assert isinstance(qoa.mode(), Streaming)
    assert qoa.total_duration() is None

    off = fmt.QOA_HEADER_SIZE
    hdr = int.from_bytes(fixture_bytes[off : off + 8], "big")
    frame_size = hdr & 0xFFFF
    first_end = off + frame_size
    first = qoa.decode_frame(fixture_bytes[off:first_end])
    assert len(first) == 5120 * 2

    hdr = int.from_bytes(fixture_bytes[first_end : first_end + 8], "big")
    frame_size = hdr & 0xFFFF
    second_end = first_end + frame_size
    second = qoa.decode_frame(fixture_bytes[first_end:second_end])
    assert len(second) == 5120 * 2

    # values must match the fixed-mode decoder
    want = codec.decode_all(fixture_bytes).samples[: 4 * 5120]
    got = np.concatenate([first, second])
    assert np.array_equal(got, want)


def test_encoder_state_checkpoint_resume():
    # get_state/set_state must allow a byte-identical resume mid-stream
    # (the checkpoint/resume axis, SURVEY.md §5; every QOA frame likewise
    # serializes its full LMS state, src/lib.rs:455-466)
    pcm = make_noise(12000, 2, seed=5, amplitude=28000)
    desc = QoaDesc(2, 44100, 12000)

    enc = QoaEncoder(desc)
    whole = io.BytesIO()
    enc.write_header(whole)
    enc.encode_frame(pcm[: 5120 * 2], whole)
    snap = enc.get_state()
    enc.encode_frame(pcm[5120 * 2 : 10240 * 2], whole)
    enc.encode_frame(pcm[10240 * 2 :], whole)

    # resume from the snapshot in a FRESH encoder
    enc2 = QoaEncoder(desc)
    enc2.set_state(snap)
    resumed = io.BytesIO()
    enc2.encode_frame(pcm[5120 * 2 : 10240 * 2], resumed)
    enc2.encode_frame(pcm[10240 * 2 :], resumed)

    # the resumed tail must equal the uninterrupted encoder's tail bytes
    tail_start = len(whole.getvalue()) - len(resumed.getvalue())
    assert whole.getvalue()[tail_start:] == resumed.getvalue()
    # and the snapshot itself round-trips through get/set
    assert np.array_equal(enc2.get_state()["history"], enc.get_state()["history"])
    assert np.array_equal(enc2.get_state()["weights"], enc.get_state()["weights"])
    assert enc2.get_state()["prev_scalefactor"] == enc.get_state()["prev_scalefactor"]


def test_streaming_decoder_yields_default_first_header():
    # faithful quirk: streaming mode yields FrameHeader(0,0,0) first
    # (src/lib.rs:674-678 with Default current_frame)
    pcm = make_sine(40, 1)
    data = ref.encode_all_py(pcm, 1, 44100, 40)
    qoa = QoaDecoder.new_streaming()
    qoa._reader.append(data[8:])
    items = list(qoa)
    assert items[0] == FrameHeader(0, 0, 0)
    assert items[1] == FrameHeader(1, 44100, 40)
    assert len(items) == 2 + 40


def test_streaming_partial_frame_buffers():
    # divergence (documented): partial frames buffer instead of erroring
    pcm = make_sine(100, 1)
    data = ref.encode_all_py(pcm, 1, 44100, 100)
    frame = data[8:]
    qoa = QoaDecoder.new_streaming()
    assert len(qoa.decode_frame(frame[:10])) == 0
    assert len(qoa.decode_frame(frame[10:30])) == 0
    out = qoa.decode_frame(frame[30:])
    assert len(out) == 100


def test_decoder_open_and_into_inner(tmp_path, fixture_bytes):
    p = tmp_path / "x.qoa"
    p.write_bytes(fixture_bytes)
    dec = QoaDecoder.open(p)
    hdr, samples = dec.next_frame()
    assert hdr.num_samples_per_channel == 5120
    assert len(samples) == 5120 * 2
    inner = dec.into_inner()
    assert hasattr(inner, "read")
    inner.close()


def test_decoder_rejects_bad_magic():
    with pytest.raises(NotQoaFile):
        QoaDecoder(b"nope" + b"\x00" * 100)


def test_decoder_no_samples():
    with pytest.raises(NoSamples):
        QoaDecoder(fmt.pack_file_header(123))  # header only, no frames


def test_next_frame_walk(fixture_bytes):
    dec = QoaDecoder(fixture_bytes)
    n = 0
    total = 0
    while True:
        out = dec.next_frame()
        if out is None:
            break
        hdr, samples = out
        n += 1
        total += len(samples)
    assert n == FIXTURE_FRAMES
    assert total == FIXTURE_SAMPLES_PER_CHANNEL * 2


def test_streaming_encoder_equals_oneshot_jax():
    pcm = make_noise(12000, 2, seed=21, amplitude=26000)
    desc = QoaDesc(2, 44100, 12000)

    oneshot = codec.encode_all(pcm, desc)

    enc = QoaEncoder(desc)
    out = io.BytesIO()
    enc.write_header(out)
    offset = 0
    while offset < 12000:
        n = min(12000 - offset, fmt.QOA_FRAME_LEN)
        enc.encode_frame(pcm[offset * 2 : (offset + n) * 2], out)
        offset += n
    assert out.getvalue() == oneshot


def test_encoder_oneshot_method_matches_module_fn():
    pcm = make_sine(3000, 1)
    desc = QoaDesc(1, 44100, 3000)
    assert QoaEncoder(desc).encode(pcm) == codec.encode_all(pcm, desc)


def test_encoder_backend_numpy_matches_jax():
    pcm = make_noise(700, 2, seed=13)
    desc = QoaDesc(2, 44100, 700)
    a = QoaEncoder(desc, backend="numpy").encode(pcm)
    b = QoaEncoder(desc, backend="jax").encode(pcm)
    assert a == b


def test_encode_frame_validation():
    enc = QoaEncoder(QoaDesc(2, 44100, 10000))
    out = io.BytesIO()
    with pytest.raises(InvalidSamples):
        enc.encode_frame(np.empty(0, np.int16), out)
    with pytest.raises(InvalidSamples):
        enc.encode_frame(np.zeros(3, np.int16), out)  # not multiple of ch
    with pytest.raises(InvalidSamples):
        enc.encode_frame(
            np.zeros((fmt.QOA_FRAME_LEN + 1) * 2, np.int16), out
        )


def test_encoder_prev_scalefactor_tracked():
    pcm = make_noise(100, 1, seed=2)
    enc = QoaEncoder(QoaDesc(1, 44100, 100))
    enc.encode(pcm)
    # matches the oracle's vestigial prev_scalefactor
    pyenc = ref.PyEncoder(1, 44100, 100)
    pyenc.encode(list(map(int, pcm)))
    assert enc.prev_scalefactor == pyenc.prev_scalefactor


def test_seek_to_frame(fixture_bytes):
    # O(1) random access: frame k's samples must equal the linear decode's
    want = codec.decode_all(fixture_bytes).samples.reshape(-1, 2)
    dec = QoaDecoder(fixture_bytes)
    for k in (100, 3, 467):
        dec.seek_to_frame(k)
        hdr, block = dec.next_frame()
        spc = hdr.num_samples_per_channel
        got = np.asarray(block).reshape(-1, 2)
        lo = k * 5120
        assert np.array_equal(got, want[lo : lo + spc]), f"frame {k}"
    from qoaudio_tpu.errors import IoError as QIoError

    with pytest.raises(QIoError):
        dec.seek_to_frame(468)
    with pytest.raises(QIoError):
        QoaDecoder.new_streaming().seek_to_frame(0)


def test_decode_range(fixture_bytes):
    want = codec.decode_all(fixture_bytes).samples.reshape(-1, 2)
    for lo, hi in [(0, 100), (5120 * 3 - 7, 5120 * 3 + 7), (2394000, 2394122),
                   (123456, 123456)]:
        out = codec.decode_range(fixture_bytes, lo, hi)
        got = out.samples.reshape(-1, 2) if out.samples.size else out.samples
        assert len(out.samples) == (hi - lo) * 2
        if hi > lo:
            assert np.array_equal(got, want[lo:hi]), (lo, hi)


def test_streaming_mode_format_change():
    # streaming mode permits per-frame channel/rate changes with LMS state
    # re-sized on the fly (reference src/lib.rs:263-268); fixed mode rejects
    # the same change (tested in test_native.py)
    pcm1 = make_sine(200, 1)
    d1 = codec.encode_all(pcm1, QoaDesc(1, 44100, 200))
    pcm2 = make_noise(300, 2, seed=77)
    d2 = codec.encode_all(pcm2, QoaDesc(2, 22050, 300))

    qoa = QoaDecoder.new_streaming()
    s1 = qoa.decode_frame(d1[8:])
    s2 = qoa.decode_frame(d2[8:])
    assert np.array_equal(s1, codec.decode_all(d1).samples)
    assert np.array_equal(s2, codec.decode_all(d2).samples)
    assert qoa.current_frame_header() == FrameHeader(2, 22050, 300)


def test_open_routes_to_native_backend(tmp_path, fixture_bytes):
    # the documented entry points must default to the FAST backend chain
    # (auto -> native when the engine builds), not the numpy oracle
    from qoaudio_tpu import native

    p = tmp_path / "y.qoa"
    p.write_bytes(fixture_bytes)
    dec = QoaDecoder.open(p)
    want = "native" if native.available() else "numpy"
    assert dec._backend == want
    assert QoaDecoder.new_streaming()._backend == want


def _encode_uniform_frames(pcm, channels, rate, frame_len):
    """Build a VALID fixed-mode stream whose uniform frames carry
    ``frame_len`` (< 5120) samples each — allowed by the format (the
    decoder reads spc from every header, reference src/lib.rs:217-225)."""
    from qoaudio_tpu.streaming import QoaEncoder

    n = len(pcm) // channels
    enc = QoaEncoder(QoaDesc(channels, rate, n))
    import io

    buf = io.BytesIO()
    enc.write_header(buf)
    for off in range(0, n, frame_len):
        end = min(off + frame_len, n)
        enc.encode_frame(pcm[off * channels : end * channels], buf)
    return buf.getvalue()


@pytest.mark.parametrize("frame_len", [2560, 2570, 100])
def test_decode_range_non_default_uniform_frames(frame_len):
    # decode_range must derive the frame stride from the PARSED uniform
    # frame size (2570 also exercises spc % 20 != 0, where frames are not
    # window-aligned and the contiguous interleave layout cannot be used)
    channels = 2
    n = frame_len * 3 + frame_len // 2
    pcm = make_noise(n, channels, seed=13)
    data = _encode_uniform_frames(pcm, channels, 44100, frame_len)

    from qoaudio_tpu import bitstream as bs

    pa = bs.parse_file_arrays(data)
    assert pa is not None and int(pa.samples_per_frame[0]) == frame_len

    want = codec.decode_all(data).samples.reshape(-1, channels)
    assert want.shape[0] == n
    ranges = [
        (0, 5),
        (frame_len - 3, frame_len + 3),
        (2 * frame_len + 7, 3 * frame_len + 1),
        (n - 4, n),
        (7, 7),
    ]
    for lo, hi in ranges:
        out = codec.decode_range(data, lo, hi)
        assert len(out.samples) == (hi - lo) * channels
        if hi > lo:
            got = out.samples.reshape(-1, channels)
            assert np.array_equal(got, want[lo:hi]), (lo, hi)


def test_prefetch_pipeline_bit_exact_and_engaged(fixture_bytes):
    # the async readahead (host-IO/decode overlap, SURVEY.md §2.2 PP) must
    # deliver the identical sample stream, and must actually have served
    # batches decoded ahead of the consumer
    want = codec.decode_all(fixture_bytes).samples
    dec = QoaDecoder(fixture_bytes, prefetch=True)
    assert dec._prefetch_enabled
    got = dec.decode_pending()
    assert np.array_equal(got, want)
    assert dec.prefetch_hits > 0  # 468 frames / 32 per batch >> 1

    # in-memory bytes default to synchronous (no IO latency to hide)
    dec2 = QoaDecoder(fixture_bytes)
    assert not dec2._prefetch_enabled
    assert np.array_equal(dec2.decode_pending(), want)
    assert dec2.prefetch_hits == 0

    # streaming-mode decoders never prefetch (the growable buffer's cursor
    # belongs to the feeding thread)
    assert not QoaDecoder.new_streaming()._prefetch_enabled


def test_prefetch_seek_interaction(tmp_path, fixture_bytes):
    p = tmp_path / "z.qoa"
    p.write_bytes(fixture_bytes)
    want = codec.decode_all(fixture_bytes).samples.reshape(-1, 2)
    dec = QoaDecoder.open(p)
    assert dec._prefetch_enabled  # file sources pipeline by default
    # drain a little so a prefetch is in flight, then seek over it
    first = dec.next_frame()[1]
    assert np.array_equal(first.reshape(-1, 2), want[:5120])
    dec.seek_to_frame(100)
    hdr, block = dec.next_frame()
    assert np.array_equal(block.reshape(-1, 2), want[100 * 5120 : 101 * 5120])
    # and a truncated stream still yields the exact item sequence with
    # prefetch enabled (the deferred error crosses the worker boundary)
    cut = fixture_bytes[: len(fixture_bytes) // 3 + 13]
    from qoaudio_tpu.errors import QoaError

    n = 0
    try:
        for item in QoaDecoder(cut):
            if not isinstance(item, FrameHeader):
                n += 1
    except QoaError:
        pass
    flat = want.reshape(-1)
    assert np.array_equal(
        codec.decode_all(fixture_bytes).samples[:n], flat[:n]
    )


@pytest.mark.parametrize("frame_len", [2570, 2560, 100])
def test_streaming_decoder_non_default_uniform_frames(frame_len):
    # the slab fast path must deliver exact PCM for VALID uniform streams
    # whose frame length is not a multiple of 20 (2570): the fused
    # interleave+trim stride only trims the last frame, so non-aligned
    # slabs need per-frame trimming (regression: first mismatch used to
    # appear in the second slab batch)
    channels = 2
    n_frames = 20
    n = frame_len * (n_frames - 1) + frame_len // 2
    pcm = make_noise(n, channels, seed=31)
    data = _encode_uniform_frames(pcm, channels, 44100, frame_len)
    want = codec.decode_all(data).samples

    dec = QoaDecoder(data, readahead=4)
    slab_batches = 0
    orig = dec._produce_slab
    orig_into = dec._produce_slab_into

    def spy():
        nonlocal slab_batches
        out = orig()
        if out is not None:
            slab_batches += 1
        return out

    def spy_into(dst, want_frames):
        # the bulk-drain path (decode_pending on aligned in-memory stereo
        # streams) decodes straight into the output instead
        nonlocal slab_batches
        m = orig_into(dst, want_frames)
        if m:
            slab_batches += 1
        return m

    dec._produce_slab = spy
    dec._produce_slab_into = spy_into
    got = dec.decode_pending()
    assert np.array_equal(got, want)
    if dec._backend == "native":
        assert slab_batches >= 1  # a fast path actually ran


@pytest.mark.parametrize("source", ["fixed", "streaming"])
def test_jax_backend_streaming_decoder(source):
    # the jax device-kernel branch of _decode_group must deliver the same
    # sample stream as decode_all (multi-frame + short tail), in both
    # fixed mode and streaming mode with a mid-stream format change
    channels = 2
    n = 5120 * 2 + 777  # two full frames + a short, non-window-aligned tail
    pcm = make_noise(n, channels, seed=91)
    data = codec.encode_all(pcm, QoaDesc(channels, 44100, n))
    want = codec.decode_all(data).samples
    if source == "fixed":
        dec = QoaDecoder(data, backend="jax", readahead=2)
        assert np.array_equal(dec.decode_pending(), want)
    else:
        qoa = QoaDecoder.new_streaming(backend="jax")
        assert np.array_equal(qoa.decode_frame(data[8:]), want)
        # format change: different channel count and rate mid-stream
        pcm2 = make_noise(300, 1, seed=92)
        d2 = codec.encode_all(pcm2, QoaDesc(1, 22050, 300))
        assert np.array_equal(
            qoa.decode_frame(d2[8:]), codec.decode_all(d2).samples
        )
        assert qoa.current_frame_header() == FrameHeader(1, 22050, 300)


def test_seek_to_frame_non_uniform_stream_raises():
    # fixed-mode streams may legally contain partial INTERIOR frames
    # (reference src/lib.rs:54-57); the uniform-stride seek must detect
    # the geometry break and raise instead of mis-seeking silently
    channels = 1
    lens = [5120, 3000, 5120, 2000]  # interior partial frames
    n = sum(lens)
    pcm = make_noise(n, channels, seed=44)
    enc = QoaEncoder(QoaDesc(channels, 44100, n))
    buf = io.BytesIO()
    enc.write_header(buf)
    off = 0
    for ln in lens:
        enc.encode_frame(pcm[off * channels : (off + ln) * channels], buf)
        off += ln
    data = buf.getvalue()

    from qoaudio_tpu.errors import IoError as QIoError

    dec = QoaDecoder(data)
    dec.seek_to_frame(0)  # frame 0 always lies at the arithmetic offset
    hdr, block = dec.next_frame()
    assert np.array_equal(
        block, codec.decode_all(data).samples[: 5120 * channels]
    )
    with pytest.raises(QIoError):
        dec.seek_to_frame(1)  # frame 1 exists but not at index*stride

    # the failed seek must leave the decoder fully consistent: iteration
    # resumes exactly where it stood (frame 1 comes next), no stale
    # buffers, no dead flag
    want_all = codec.decode_all(data).samples
    hdr2, block2 = dec.next_frame()
    assert hdr2.num_samples_per_channel == lens[1]
    assert np.array_equal(
        block2, want_all[5120 * channels : (5120 + lens[1]) * channels]
    )

    # and a NON-default uniform stream still seeks fine (the prediction
    # derives from the parsed first-frame geometry, not the 5120 default)
    frame_len = 2570
    n2 = frame_len * 3 + 123
    pcm2 = make_noise(n2, channels, seed=45)
    data2 = _encode_uniform_frames(pcm2, channels, 44100, frame_len)
    want2 = codec.decode_all(data2).samples.reshape(-1, channels)
    dec2 = QoaDecoder(data2)
    for k in (2, 0, 3):
        dec2.seek_to_frame(k)
        hdr, block = dec2.next_frame()
        lo = k * frame_len
        assert np.array_equal(
            np.asarray(block).reshape(-1, channels),
            want2[lo : lo + hdr.num_samples_per_channel],
        ), f"frame {k}"


def test_seek_to_frame_tell_less_reader_refused_up_front(fixture_bytes):
    # a seekable-but-not-tellable reader cannot honor the "decoder (and
    # reader) untouched on failure" guarantee — the mismatch path would
    # have nowhere to restore the cursor to — so the seek is refused
    # BEFORE the cursor moves (ADVICE r04)
    from qoaudio_tpu.errors import IoError as QIoError

    class NoTell(io.BytesIO):
        def tell(self):
            raise OSError("tell unsupported")

    reader = NoTell(fixture_bytes)
    dec = QoaDecoder(reader)
    hdr0, block0 = dec.next_frame()  # decoder works without seeking
    assert hdr0.num_samples_per_channel > 0
    with pytest.raises(QIoError, match="tellable"):
        dec.seek_to_frame(3)
    # decoder still fully consistent: the next frame is frame 1
    want = codec.decode_all(fixture_bytes).samples
    hdr1, block1 = dec.next_frame()
    spc0 = hdr0.num_samples_per_channel * 2
    assert np.array_equal(
        np.asarray(block1),
        want[spc0 : spc0 + hdr1.num_samples_per_channel * 2],
    )


def test_streaming_decoder_survives_dry_iteration():
    # pulling from a dry streaming decoder must NOT brick it: the
    # reference resumes iteration once decode_frame feeds more bytes
    # (src/lib.rs:641-651 drains the iterator repeatedly)
    qoa = QoaDecoder.new_streaming()
    first = next(qoa)
    assert first == FrameHeader(0, 0, 0)
    with pytest.raises(StopIteration):
        next(qoa)  # dry, but not end-of-stream
    assert qoa.decode_pending().size == 0

    pcm = make_noise(300, 2, seed=71)
    d = codec.encode_all(pcm, QoaDesc(2, 44100, 300))
    got = qoa.decode_frame(d[8:])
    assert np.array_equal(got, codec.decode_all(d).samples)


def test_failed_seek_with_prefetch_loses_no_frames(tmp_path):
    # a failed seek must re-queue the in-flight prefetched batch: the
    # stream continues with every frame exactly once
    frame_len = 512
    n_frames = 24
    channels = 1
    n = frame_len * n_frames
    pcm = make_noise(n, channels, seed=72)
    data = _encode_uniform_frames(pcm, channels, 44100, frame_len)
    p = tmp_path / "u.qoa"
    p.write_bytes(data)

    want = codec.decode_all(data).samples
    dec = QoaDecoder.open(p, readahead=4, prefetch=True)
    assert dec._prefetch_enabled
    got = [np.asarray(dec.next_frame()[1])]  # ensures a prefetch is launched
    from qoaudio_tpu.errors import IoError as QIoError

    with pytest.raises(QIoError):
        dec.seek_to_frame(n_frames + 50) if False else None
        # an out-of-range index raises before touching anything; use a
        # mismatching stride instead: temporarily lie about the geometry
        dec._first_frame_size += 8
        try:
            dec.seek_to_frame(5)
        finally:
            dec._first_frame_size -= 8
    while True:
        nxt = dec.next_frame()
        if nxt is None:
            break
        got.append(np.asarray(nxt[1]))
    assert np.array_equal(np.concatenate(got), want)


def test_lying_frame_size_field_decodes_exactly():
    # the reference reader consumes ceil(spc/20) slices and never uses the
    # declared frame_size (src/lib.rs:291-330); a stream whose headers lie
    # about frame_size must still decode bit-exactly (the slab fast path
    # detects the inconsistency and falls back)
    channels = 2
    frame_len = 400
    n_frames = 12
    n = frame_len * n_frames
    pcm = make_noise(n, channels, seed=73)
    data = bytearray(_encode_uniform_frames(pcm, channels, 44100, frame_len))
    want = codec.decode_all(bytes(data)).samples

    true_fs = fmt.qoa_frame_size(channels, frame_len // 20)
    off = fmt.QOA_HEADER_SIZE
    while off + 8 <= len(data):
        hdr = int.from_bytes(data[off : off + 8], "big")
        assert hdr & 0xFFFF == true_fs
        # plausible but wrong: one extra slice per channel keeps the
        # header valid per the reference's checks (num_slices must be a
        # channel multiple, src/lib.rs:239-241) while lying about size
        lying = (hdr & ~0xFFFF) | (true_fs + 8 * channels)
        data[off : off + 8] = lying.to_bytes(8, "big")
        off += true_fs  # the REAL layout stride
    patched = bytes(data)

    for backend in ("native", "numpy"):
        try:
            dec = QoaDecoder(patched, backend=backend, readahead=4)
        except RuntimeError:
            continue  # native engine unavailable on this host
        assert np.array_equal(dec.decode_pending(), want), backend


def test_growable_buffer_compacts():
    qoa = QoaDecoder.new_streaming()
    pcm = make_noise(5120, 2, seed=74)
    d = codec.encode_all(pcm, QoaDesc(2, 44100, 5120))
    for _ in range(50):
        out = qoa.decode_frame(d[8:])
        assert out.size == 5120 * 2
    # consumed bytes are compacted away: the buffer holds at most ~one
    # frame's worth of unconsumed bytes, not 50 frames of history
    assert len(qoa._reader._buf) < 3 * len(d)


def test_seek_zero_sample_first_frame_typed_error():
    # malformed but parseable: fixed-mode header claims samples, the first
    # frame declares spc == 0 — seek must raise the typed IoError, never
    # ZeroDivisionError
    from qoaudio_tpu.errors import IoError as QIoError

    hdr = fmt.pack_file_header(100)
    # spc=0 with a size declaring one slice passes the header checks
    # (they validate frame_size only; reads are spc-driven)
    frame = fmt.pack_frame_header(1, 44100, 0, fmt.qoa_frame_size(1, 1))
    lms = b"\x00" * 16
    data = hdr + frame.to_bytes(8, "big") + lms
    dec = QoaDecoder(data)
    with pytest.raises(QIoError):
        dec.seek_to_frame(0)


def test_decoder_backend_validation():
    pcm = make_noise(100, 1, seed=75)
    d = codec.encode_all(pcm, QoaDesc(1, 44100, 100))
    with pytest.raises(ValueError, match="unknown backend"):
        QoaDecoder(d, backend="natve")
