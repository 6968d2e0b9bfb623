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
