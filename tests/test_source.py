"""Tests for the playback source adapter (rodio-source analog)."""

import numpy as np

from qoaudio_tpu import QoaDecoder, QoaPcmSource, codec
from qoaudio_tpu import format as fmt
from qoaudio_tpu import reference as ref

from conftest import make_noise, make_sine


def test_source_yields_all_samples():
    pcm = make_sine(150, 2)
    data = ref.encode_all_py(pcm, 2, 44100, 150)
    src = QoaPcmSource(QoaDecoder(data))
    got = np.array(list(src), dtype=np.int16)
    want = codec.decode_all(data).samples
    assert np.array_equal(got, want)


def test_source_metadata():
    pcm = make_sine(100, 2)
    data = ref.encode_all_py(pcm, 2, 22050, 100)
    src = QoaPcmSource(QoaDecoder(data))
    next(src)  # pull one sample so the frame is staged
    assert src.channels == 2
    assert src.sample_rate == 22050
    assert src.total_duration() == 100 / 22050
    assert src.current_frame_len() is None  # fixed mode


def test_source_streaming_frame_len():
    pcm = make_sine(60, 1)
    data = ref.encode_all_py(pcm, 1, 44100, 60)
    dec = QoaDecoder.new_streaming()
    dec._reader.append(data[8:])
    src = QoaPcmSource(dec)
    next(src)
    remaining = src.current_frame_len()
    assert remaining == 59  # 60 samples staged, one consumed
    assert src.sample_rate == 44100


def test_source_bulk_read():
    pcm = make_noise(6000, 2, seed=5)
    data = ref.encode_all_py(pcm, 2, 44100, 6000)
    src = QoaPcmSource(QoaDecoder(data))
    a = src.read(1000)
    b = src.read()  # rest
    got = np.concatenate([a, b])
    want = codec.decode_all(data).samples
    assert np.array_equal(got, want)


def test_source_header_prefetch_across_frames():
    # multi-frame stream: after consuming the last sample of frame 1 the
    # metadata must already describe frame 2 (reference prefetch contract)
    pcm = make_noise(fmt.QOA_FRAME_LEN + 100, 1, seed=6)
    data = ref.encode_all_py(pcm, 1, 44100, fmt.QOA_FRAME_LEN + 100)
    src = QoaPcmSource(QoaDecoder(data))
    for _ in range(fmt.QOA_FRAME_LEN):
        next(src)
    hdr = src._decoder.current_frame_header()
    assert hdr.num_samples_per_channel == 100


def test_read_stops_at_format_change_and_metadata_matches():
    # bulk read must return single-format blocks: a stream that switches
    # channels/rate mid-way yields one segment per format, with
    # channels/sample_rate describing each block exactly
    from qoaudio_tpu import codec
    from qoaudio_tpu.source import QoaPcmSource
    from qoaudio_tpu.streaming import QoaDecoder
    from qoaudio_tpu.types import QoaDesc

    pcm1 = make_noise(300, 1, seed=81)
    d1 = codec.encode_all(pcm1, QoaDesc(1, 48000, 300))
    pcm2 = make_noise(200, 2, seed=82)
    d2 = codec.encode_all(pcm2, QoaDesc(2, 44100, 200))

    dec = QoaDecoder.new_streaming()
    dec._reader.append(d1[8:] + d2[8:])
    src = QoaPcmSource(dec)
    seg1 = src.read()
    assert len(seg1) == 300
    # read() stopped at the change; metadata describes the staged frame
    assert (src.channels, src.sample_rate) == (2, 44100)
    seg2 = src.read()
    assert len(seg2) == 400
    assert (src.channels, src.sample_rate) == (2, 44100)
    assert np.array_equal(seg1, codec.decode_all(d1).samples)
    assert np.array_equal(seg2, codec.decode_all(d2).samples)
    assert src.read().size == 0


def test_current_frame_len_at_boundary_describes_next_frame():
    # after the boundary prefetch, channels/rate describe the NEXT frame —
    # current_frame_len must agree (the reference returns the next frame's
    # full count, src/lib.rs:966-975)
    from qoaudio_tpu import codec
    from qoaudio_tpu.source import QoaPcmSource
    from qoaudio_tpu.streaming import QoaDecoder
    from qoaudio_tpu.types import QoaDesc

    pcm1 = make_noise(40, 1, seed=83)
    d1 = codec.encode_all(pcm1, QoaDesc(1, 44100, 40))
    pcm2 = make_noise(60, 1, seed=84)
    d2 = codec.encode_all(pcm2, QoaDesc(1, 44100, 60))
    dec = QoaDecoder.new_streaming()
    dec._reader.append(d1[8:] + d2[8:])
    src = QoaPcmSource(dec)
    out = [next(src) for _ in range(40)]  # drain exactly frame 1
    assert np.array_equal(np.array(out, np.int16), codec.decode_all(d1).samples)
    assert src.current_frame_len() == 60  # the prefetched frame's count
