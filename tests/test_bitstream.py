"""Tests for the host framing layer (slice/LMS packing, frame parsing)."""

import numpy as np
import pytest

from qoaudio_tpu import bitstream as bs
from qoaudio_tpu import format as fmt
from qoaudio_tpu.errors import InvalidFrameHeader, IoError

from conftest import (
    FIXTURE_CHANNELS,
    FIXTURE_FRAMES,
    FIXTURE_LAST_FRAME_SAMPLES,
    FIXTURE_SAMPLE_RATE,
    FIXTURE_SAMPLES_PER_CHANNEL,
)


def test_slice_roundtrip_random():
    rng = np.random.default_rng(42)
    words = rng.integers(0, 1 << 63, size=(37,), dtype=np.int64).astype(
        np.uint64
    )
    sf, codes = bs.unpack_slices(words)
    assert sf.shape == (37,)
    assert codes.shape == (37, 20)
    repacked = bs.pack_slices(sf, codes)
    # the 'reserved' bit layout is fully covered: sf(4) + 20*3 = 64 bits
    assert np.array_equal(repacked, words)


def test_slice_pack_known_word():
    # sf=5, code sequence 0..19 mod 8, built by the shift-left recurrence
    codes = np.arange(20) % 8
    word = 5
    for c in codes:
        word = (word << 3) | int(c)
    got = bs.pack_slices(np.array([5]), codes[None, :])[0]
    assert int(got) == word
    sf2, codes2 = bs.unpack_slices(np.array([word], dtype=np.uint64))
    assert sf2[0] == 5
    assert codes2[0].tolist() == codes.tolist()


def test_lms_roundtrip():
    vals = np.array([[0, -1, 32767, -32768]], dtype=np.int32)
    words = bs.pack_lms(vals)
    back = bs.unpack_lms(words)
    assert np.array_equal(back, vals)


def test_lms_truncation_out_of_range():
    # weights beyond i16 range are truncated (reference 'as u16' cast)
    vals = np.array([[40000, -40000, 65536, 1]], dtype=np.int32)
    words = bs.pack_lms(vals)
    back = bs.unpack_lms(words)
    expected = [
        ((v + 0x8000) & 0xFFFF) - 0x8000 for v in [40000, -40000, 65536, 1]
    ]
    assert back[0].tolist() == expected


def test_parse_fixture_geometry(fixture_bytes):
    parsed = bs.parse_file(fixture_bytes)
    assert parsed.total_samples == FIXTURE_SAMPLES_PER_CHANNEL
    assert len(parsed.frames) == FIXTURE_FRAMES
    for f in parsed.frames[:-1]:
        assert f.channels == FIXTURE_CHANNELS
        assert f.sample_rate == FIXTURE_SAMPLE_RATE
        assert f.samples_per_channel == fmt.QOA_FRAME_LEN
        assert f.n_windows == 256
        assert f.frame_size == 4136
    last = parsed.frames[-1]
    assert last.samples_per_channel == FIXTURE_LAST_FRAME_SAMPLES
    assert last.n_windows == 155
    assert last.frame_size == 2520
    total = sum(f.samples_per_channel for f in parsed.frames)
    assert total == FIXTURE_SAMPLES_PER_CHANNEL


def test_stack_frames(fixture_bytes):
    parsed = bs.parse_file(fixture_bytes)
    batch = bs.stack_frames(parsed.frames)
    assert batch.sf.shape == (FIXTURE_FRAMES, 256, 2)
    assert batch.codes.shape == (FIXTURE_FRAMES, 256, 2, 20)
    assert batch.history.shape == (FIXTURE_FRAMES, 2, 4)
    assert batch.samples_per_frame[-1] == FIXTURE_LAST_FRAME_SAMPLES


def test_truncated_stream_errors(fixture_bytes):
    # cut inside the first frame's slice data
    with pytest.raises(IoError):
        bs.parse_file(fixture_bytes[:100])
    # cut inside the LMS state
    with pytest.raises(IoError):
        bs.parse_file(fixture_bytes[:20])
    # cut inside a frame header: CLEAN end — the reference maps
    # UnexpectedEof on the header word to Ok(false) (src/lib.rs:205-215)
    assert bs.parse_file(fixture_bytes[:12]).frames == []
    # cut after a whole frame: clean end with that frame parsed
    hdr0 = int.from_bytes(fixture_bytes[8:16], "big")
    fsize = fmt.unpack_frame_header(hdr0)[3]
    parsed = bs.parse_file(fixture_bytes[: 8 + fsize + 3])
    assert len(parsed.frames) == 1


def test_invalid_frame_header():
    # zero channels
    data = fmt.pack_file_header(100) + fmt.pack_frame_header(
        0, 44100, 100, 1000
    ).to_bytes(8, "big")
    with pytest.raises(InvalidFrameHeader):
        bs.parse_file(data)
    # frame size smaller than header + LMS
    data = fmt.pack_file_header(100) + fmt.pack_frame_header(
        1, 44100, 100, 20
    ).to_bytes(8, "big")
    with pytest.raises(InvalidFrameHeader):
        bs.parse_file(data)
    # slice count not a multiple of channels
    data = fmt.pack_file_header(100) + fmt.pack_frame_header(
        2, 44100, 100, 8 + 32 + 8 * 3
    ).to_bytes(8, "big")
    with pytest.raises(InvalidFrameHeader):
        bs.parse_file(data)
    # more than 256 slices per channel
    data = fmt.pack_file_header(100) + fmt.pack_frame_header(
        1, 44100, 100, 8 + 16 + 8 * 257
    ).to_bytes(8, "big")
    with pytest.raises(InvalidFrameHeader):
        bs.parse_file(data)


def test_build_frame_roundtrip():
    rng = np.random.default_rng(7)
    channels = 3
    words = rng.integers(0, 1 << 63, size=(4, channels), dtype=np.int64).astype(
        np.uint64
    )
    hist = rng.integers(-32768, 32767, size=(channels, 4)).astype(np.int32)
    wts = rng.integers(-32768, 32767, size=(channels, 4)).astype(np.int32)
    frame = bs.build_frame_bytes(channels, 48000, 70, hist, wts, words)
    data = fmt.pack_file_header(70) + frame
    parsed = bs.parse_file(data)
    assert len(parsed.frames) == 1
    rec = parsed.frames[0]
    assert rec.channels == channels
    assert rec.sample_rate == 48000
    assert rec.samples_per_channel == 70
    assert rec.n_windows == 4
    assert np.array_equal(rec.slice_words, words)
    assert np.array_equal(rec.lms_history, hist)
    assert np.array_equal(rec.lms_weights, wts)


def test_parse_file_arrays_matches_general_walk(fixture_bytes):
    # the O(1)-per-frame arithmetic parse must agree exactly with the
    # sequential frame walk: same LMS seeds, same raw slice words
    pa = bs.parse_file_arrays(fixture_bytes)
    assert pa is not None
    parsed = bs.parse_file(fixture_bytes)
    batch = bs.stack_frames(parsed.frames)
    words_be, state = bs.batch_chain_arrays(batch)
    assert np.array_equal(pa.words_be, words_be)
    assert np.array_equal(pa.state, state)
    assert np.array_equal(pa.samples_per_frame, batch.samples_per_frame)
    assert (pa.channels, pa.sample_rate) == (batch.channels, batch.sample_rate)


def test_parse_file_arrays_rejects_streaming_mode():
    from qoaudio_tpu import codec
    from qoaudio_tpu.types import QoaDesc

    pcm = np.zeros(100, np.int16)
    data = codec.encode_all(pcm, QoaDesc(1, 44100, 100))
    assert bs.parse_file_arrays(fmt.pack_file_header(0) + data[8:]) is None


def test_parse_file_arrays_rejects_oversized_tail():
    # a final frame carrying MORE samples than the uniform interior frames
    # (legal QOA) breaks the uniform-stride indexing decode_range/seek
    # assume; the fast parser must hand such streams to the general walk
    import io

    import numpy as np

    from qoaudio_tpu import bitstream as bs
    from qoaudio_tpu import codec
    from qoaudio_tpu.streaming import QoaEncoder
    from qoaudio_tpu.types import QoaDesc

    rng = np.random.default_rng(61)
    lens = [90, 90, 90, 100]
    n = sum(lens)
    pcm = rng.integers(-28000, 28000, n).astype(np.int16)
    enc = QoaEncoder(QoaDesc(1, 44100, n))
    buf = io.BytesIO()
    enc.write_header(buf)
    off = 0
    for ln in lens:
        enc.encode_frame(pcm[off : off + ln], buf)
        off += ln
    data = buf.getvalue()

    assert bs.parse_file_arrays(data) is None
    want = codec.decode_all(data).samples  # general walk handles it
    assert len(want) == n
    # decode_range falls back to the full decode and stays exact
    out = codec.decode_range(data, n - 10, n)
    assert np.array_equal(out.samples, want[n - 10 :])


def test_parse_file_arrays_corrupt_tail_returns_none():
    # docstring contract: corrupt streams return None (callers fall back
    # and the general walk raises the typed error with exact truncation
    # semantics); a cut inside the final frame's LMS must not raise here
    import numpy as np

    from qoaudio_tpu import bitstream as bs
    from qoaudio_tpu import codec
    from qoaudio_tpu.types import QoaDesc

    rng = np.random.default_rng(62)
    n = 5120 + 300
    pcm = rng.integers(-28000, 28000, n).astype(np.int16)
    data = codec.encode_all(pcm, QoaDesc(1, 44100, n))
    cut = data[: len(data) - 40]  # inside the final frame
    assert bs.parse_file_arrays(cut) is None


def test_assemble_stream_bytes_zero_samples_typed_error():
    import numpy as np
    import pytest

    from qoaudio_tpu import bitstream as bs
    from qoaudio_tpu.errors import InvalidSamples

    with pytest.raises(InvalidSamples):
        bs.assemble_stream_bytes(
            1, 44100, 0, np.zeros((1, 8, 1), np.int32), np.zeros((1, 1, 1), np.uint64)
        )
