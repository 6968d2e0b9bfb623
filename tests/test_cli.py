"""CLI tests (analogs of the reference examples)."""

import numpy as np
import pytest

from qoaudio_tpu import cli, codec
from qoaudio_tpu.types import QoaDesc
from qoaudio_tpu.utils.wav import read_wav, write_wav

from conftest import make_noise, make_sine


@pytest.fixture
def wav_file(tmp_path):
    pcm = make_sine(5000, 2)
    p = tmp_path / "in.wav"
    write_wav(p, pcm, 2, 44100)
    return p, pcm


def test_wav_roundtrip(tmp_path):
    pcm = make_noise(777, 2, seed=1)
    p = tmp_path / "t.wav"
    write_wav(p, pcm, 2, 48000)
    got, ch, rate = read_wav(p)
    assert ch == 2 and rate == 48000
    assert np.array_equal(got, pcm)


def test_cli_encode_decode(tmp_path, wav_file, capsys):
    wav_in, pcm = wav_file
    qoa = tmp_path / "out.qoa"
    wav_out = tmp_path / "out.wav"

    assert cli.main(["encode", str(wav_in), str(qoa)]) == 0
    out = capsys.readouterr().out
    assert "compression" in out

    # encoded bytes must match the library API
    want = codec.encode_all(pcm, QoaDesc(2, 44100, 5000))
    assert qoa.read_bytes() == want

    assert cli.main(["decode", str(qoa), str(wav_out)]) == 0
    got, ch, rate = read_wav(wav_out)
    assert ch == 2 and rate == 44100
    assert np.array_equal(got, codec.decode_all(want).samples)


def test_cli_play_wav_sink(tmp_path, wav_file, capsys):
    wav_in, pcm = wav_file
    qoa = tmp_path / "o.qoa"
    cli.main(["encode", str(wav_in), str(qoa)])
    out_wav = tmp_path / "rendered.wav"
    assert cli.main(["play", str(qoa), "--output", str(out_wav)]) == 0
    got, ch, rate = read_wav(out_wav)
    assert ch == 2 and rate == 44100
    assert len(got) == 10000


def test_cli_transcode(tmp_path, capsys):
    pcm = make_noise(3000, 1, seed=7)
    qoa = tmp_path / "a.qoa"
    qoa.write_bytes(codec.encode_all(pcm, QoaDesc(1, 44100, 3000)))
    assert (
        cli.main(
            ["transcode", str(qoa), "--out-dir", str(tmp_path / "out")]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "corpus: 1 files" in out


def test_cli_info(tmp_path, capsys):
    from qoaudio_tpu import cli, codec
    from qoaudio_tpu.types import QoaDesc

    pcm = make_sine(6000, 2)
    p = tmp_path / "x.qoa"
    p.write_bytes(codec.encode_all(pcm, QoaDesc(2, 44100, 6000)))
    assert cli.main(["info", str(p)]) == 0
    out = capsys.readouterr().out
    assert "fixed mode, 2 frames" in out
    assert "channels 2" in out
    assert "6000 samples/ch" in out


def test_cli_transcode_hbm(tmp_path, fixture_bytes):
    from qoaudio_tpu import cli, codec
    from qoaudio_tpu.types import QoaDesc

    src = tmp_path / "in.qoa"
    out = codec.decode_all(bytes(fixture_bytes))
    three = codec.encode_all(
        out.samples[: 3 * 5120 * 2], QoaDesc(2, 44100, 3 * 5120)
    )
    src.write_bytes(three)
    outdir = tmp_path / "out"
    rc = cli.main(["transcode", str(src), "--out-dir", str(outdir), "--hbm"])
    assert rc == 0
    got = (outdir / "in.qoa").read_bytes()
    dec = codec.decode_all(three)
    want = codec.encode_all(
        dec.samples, QoaDesc(dec.num_channels, dec.sample_rate, dec.samples_per_channel)
    )
    assert got == want


def test_cli_info_truncated_file_reports_partial(tmp_path, capsys, fixture_bytes):
    # info on a damaged file must report what parsed, not traceback
    from qoaudio_tpu.cli import main

    p = tmp_path / "cut.qoa"
    p.write_bytes(fixture_bytes[: len(fixture_bytes) // 2 + 13])
    assert main(["info", str(p)]) == 0
    out = capsys.readouterr().out
    assert "frames" in out and "truncated frame" in out


def test_cli_info_matches_fixture_metadata(tmp_path, capsys, fixture_bytes):
    from qoaudio_tpu.cli import main

    p = tmp_path / "full.qoa"
    p.write_bytes(fixture_bytes)
    assert main(["info", str(p)]) == 0
    out = capsys.readouterr().out
    assert "468 frames" in out and "channels 2, sample rate 44100" in out
    assert "2394122 samples/ch" in out


def test_cli_transcode_explicit_backend(tmp_path, capsys):
    # --backend must pin every stage (e.g. a numpy verification run)
    import numpy as np

    from qoaudio_tpu import codec
    from qoaudio_tpu.cli import main
    from qoaudio_tpu.types import QoaDesc

    rng = np.random.default_rng(5)
    pcm = rng.integers(-20000, 20000, 120).astype(np.int16)
    src = tmp_path / "a.qoa"
    src.write_bytes(codec.encode_all(pcm, QoaDesc(1, 44100, 120)))
    out_dir = tmp_path / "out"
    assert main([
        "--backend", "numpy", "transcode", str(src), "--out-dir", str(out_dir)
    ]) == 0
    assert "backend=numpy" in capsys.readouterr().out
    got = (out_dir / "a.qoa").read_bytes()
    want = codec.encode_all(
        codec.decode_all(src.read_bytes()).samples, QoaDesc(1, 44100, 120)
    )
    assert got == want


def _two_segment_streaming_file(tmp_path, rates=(44100, 22050)):
    """Streaming-mode file: two mono frames with different sample rates
    (per-frame format changes are streaming-mode-legal, src/lib.rs:263-268).
    """
    from qoaudio_tpu import format as fmt

    a = codec.encode_all(make_sine(100, 1, rate=rates[0]), QoaDesc(1, rates[0], 100))
    b = codec.encode_all(make_sine(100, 1, rate=rates[1]), QoaDesc(1, rates[1], 100))
    p = tmp_path / "seg.qoa"
    p.write_bytes(fmt.pack_file_header(0) + a[8:] + b[8:])
    return p


def test_cli_play_audio_sink_falls_back_to_wav(tmp_path, wav_file, capsys):
    """No sounddevice/audio device on this host: --sink audio must fall
    back to the WAV sink with a notice, not crash (cli.py probe path)."""
    wav_in, pcm = wav_file
    qoa = tmp_path / "o.qoa"
    cli.main(["encode", str(wav_in), str(qoa)])
    out_wav = tmp_path / "fallback.wav"
    assert (
        cli.main(["play", str(qoa), "--sink", "audio", "--output", str(out_wav)])
        == 0
    )
    err = capsys.readouterr().err
    assert "audio sink unavailable" in err
    got, ch, rate = read_wav(out_wav)
    assert ch == 2 and rate == 44100 and len(got) == 10000


def test_cli_play_raw_sink_streams_all_segments(tmp_path, capsysbinary):
    """--sink raw is untyped PCM: every segment streams, even across
    mid-stream format changes that the WAV sink cannot represent."""
    p = _two_segment_streaming_file(tmp_path)
    assert cli.main(["play", str(p), "--sink", "raw"]) == 0
    raw = capsysbinary.readouterr().out
    assert len(raw) == 2 * 100 * 2  # both 100-sample mono segments as i16


def test_cli_play_wav_sink_warns_on_format_change(tmp_path, capsys):
    """The WAV sink holds one format: a mid-stream change writes only the
    first segment and says so."""
    p = _two_segment_streaming_file(tmp_path)
    out_wav = tmp_path / "seg.wav"
    assert cli.main(["play", str(p), "--output", str(out_wav)]) == 0
    err = capsys.readouterr().err
    assert "format change" in err
    got, ch, rate = read_wav(out_wav)
    assert (ch, rate, len(got)) == (1, 44100, 100)


def test_cli_play_header_only_stream(tmp_path, capsys):
    """A parseable stream with zero frames renders nothing, exits 0."""
    from qoaudio_tpu import format as fmt

    p = tmp_path / "empty.qoa"
    p.write_bytes(fmt.pack_file_header(0))
    assert cli.main(["play", str(p)]) == 0
    out = capsys.readouterr().out
    assert "no playable frames" in out


def test_cli_info_damage_reports(tmp_path, capsys):
    """info must classify damage: bad interior header, trailing bytes."""
    from qoaudio_tpu import format as fmt

    pcm = make_sine(100, 1)
    good = codec.encode_all(pcm, QoaDesc(1, 44100, 100))

    bad_hdr = good + fmt.pack_frame_header(0, 44100, 100, 16).to_bytes(8, "big")
    p1 = tmp_path / "badhdr.qoa"
    p1.write_bytes(bad_hdr)
    assert cli.main(["info", str(p1)]) == 0
    assert "invalid frame header" in capsys.readouterr().out

    p2 = tmp_path / "trail.qoa"
    p2.write_bytes(good + b"\x01\x02\x03")
    assert cli.main(["info", str(p2)]) == 0
    assert "trailing 3 bytes" in capsys.readouterr().out

    p3 = tmp_path / "hdronly.qoa"
    p3.write_bytes(fmt.pack_file_header(0))
    assert cli.main(["info", str(p3)]) == 0
    assert "no frames" in capsys.readouterr().out


def test_cli_play_audio_sink_reopens_per_segment(tmp_path, monkeypatch):
    """The audio sink must label every block with ITS OWN format: a read
    that stops at a format boundary leaves the source's channels/
    sample_rate describing the NEXT staged frame, so using those for the
    current block reshaped mono PCM as stereo (fixed bug)."""
    import sys as _sys
    import types as _types

    opened = []
    writes = []

    class FakeStream:
        def __init__(self, samplerate, channels, dtype):
            assert dtype == "int16"
            self.samplerate, self.channels = samplerate, channels
            opened.append((channels, samplerate))
            writes.append(0)

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

        def write(self, arr):
            assert arr.ndim == 2 and arr.shape[1] == self.channels
            writes[-1] += arr.shape[0] * arr.shape[1]

    fake = _types.SimpleNamespace(
        OutputStream=FakeStream,
        check_output_settings=lambda **kw: None,
    )
    monkeypatch.setitem(_sys.modules, "sounddevice", fake)
    p = _two_segment_streaming_file(tmp_path)  # mono 44100, then mono 22050
    assert cli.main(["play", str(p), "--sink", "audio"]) == 0
    assert opened == [(1, 44100), (1, 22050)]
    assert writes == [100, 100]


def test_cli_play_audio_sink_misaligned_pending_block(tmp_path, monkeypatch):
    """A pending block captured at a format boundary is read with the OLD
    segment's value limit (8192*ch0 - 1), which can stop mid-frame of the
    NEW segment at a count that is not a multiple of the new channel
    count; the sink must write whole samples and carry the tail instead
    of crashing on reshape (ADVICE r04).  Construction: a 1-sample mono
    first segment (so first=read(1) consumes it entirely) followed by a
    long stereo segment (so top=read(8191) stops mid-frame at 8191
    values, an odd count)."""
    import sys as _sys
    import types as _types

    from qoaudio_tpu import format as fmt

    opened = []
    written = []

    class FakeStream:
        def __init__(self, samplerate, channels, dtype):
            self.channels = channels
            opened.append((channels, samplerate))

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

        def write(self, arr):
            assert arr.ndim == 2 and arr.shape[1] == self.channels
            written.append(arr.copy())

    fake = _types.SimpleNamespace(
        OutputStream=FakeStream,
        check_output_settings=lambda **kw: None,
    )
    monkeypatch.setitem(_sys.modules, "sounddevice", fake)

    a = codec.encode_all(make_sine(1, 1, rate=44100), QoaDesc(1, 44100, 1))
    n2 = 5120
    pcm2 = make_sine(n2, 2, rate=22050)
    b = codec.encode_all(pcm2, QoaDesc(2, 22050, n2))
    p = tmp_path / "mis.qoa"
    p.write_bytes(fmt.pack_file_header(0) + a[8:] + b[8:])

    assert cli.main(["play", str(p), "--sink", "audio"]) == 0
    assert opened == [(1, 44100), (2, 22050)]
    # the stereo segment must come through complete, in order, and equal
    # to its own decode (QOA is lossy: compare decoded, not source, PCM)
    got = np.concatenate([w.reshape(-1) for w in written if w.shape[1] == 2])
    assert np.array_equal(got, codec.decode_all(b).samples)


def test_python_dash_m_package_entry():
    """``python -m qoaudio_tpu`` is the CLI (qoaudio_tpu/__main__.py)."""
    import os
    import subprocess
    import sys

    fix = os.path.join(
        os.path.dirname(__file__), "fixtures", "julien_baker_sprained_ankle.qoa"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "-m", "qoaudio_tpu", "info", fix],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    assert "channels 2" in proc.stdout and "44100" in proc.stdout


def test_cli_encode_batch_to_directory(tmp_path, capsys):
    # multiple inputs: last positional is a directory; mono files pair
    # into the native chain but every output must equal the single-file
    # library encode
    pcms = {
        "m1": (make_sine(5000), 1),
        "m2": (make_sine(6100, freq=330.0), 1),
        "s1": (make_noise(4000, 2, seed=3), 2),
    }
    ins = []
    for name, (pcm, ch) in pcms.items():
        p = tmp_path / f"{name}.wav"
        write_wav(p, pcm, ch, 44100)
        ins.append(str(p))
    out_dir = tmp_path / "qoa"
    assert cli.main(["encode", *ins, str(out_dir)]) == 0
    out = capsys.readouterr().out
    assert out.count("compression") == 4  # 3 per-file lines + total
    for name, (pcm, ch) in pcms.items():
        want = codec.encode_all(pcm, QoaDesc(ch, 44100, len(pcm) // ch))
        assert (out_dir / f"{name}.qoa").read_bytes() == want


def test_cli_encode_single_into_existing_directory(tmp_path, wav_file):
    wav_in, pcm = wav_file
    out_dir = tmp_path / "d"
    out_dir.mkdir()
    assert cli.main(["encode", str(wav_in), str(out_dir)]) == 0
    want = codec.encode_all(pcm, QoaDesc(2, 44100, 5000))
    assert (out_dir / "in.qoa").read_bytes() == want
