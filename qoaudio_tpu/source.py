"""Playback source adapter (analog of the reference's rodio integration).

Reference: ``QoaRodioSource`` (/root/reference/src/lib.rs:914-989) wraps a
decoder as an ``Iterator<Item = i16>`` whose ``channels()`` /
``sample_rate()`` always describe the *next* sample to be returned — it
prefetches the next frame header at frame boundaries so mid-stream format
changes (streaming mode) are visible to the audio sink at the right moment
(src/lib.rs:941-954).

``QoaPcmSource`` provides the same contract for Python audio sinks
(sounddevice/pyaudio/wave writers): iterate i16 samples, query
``channels`` / ``sample_rate`` / ``current_frame_len`` / ``total_duration``
at any point.  Errors end iteration, like the reference.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .streaming import QoaDecoder
from .types import Streaming


class QoaPcmSource:
    """Iterator of i16 samples over a :class:`QoaDecoder`."""

    def __init__(self, decoder: QoaDecoder):
        self._decoder = decoder
        self._buffer: Optional[np.ndarray] = None
        self._idx = 0
        self._next_frame = None  # prefetched (header, samples)
        self._finished = False

    # -- source metadata ---------------------------------------------------

    @property
    def channels(self) -> int:
        return self._decoder.current_frame_header().num_channels

    @property
    def sample_rate(self) -> int:
        return self._decoder.current_frame_header().sample_rate

    def current_frame_len(self) -> Optional[int]:
        """Interleaved samples remaining in the current frame (streaming
        mode only; None in fixed mode — src/lib.rs:966-975)."""
        if not isinstance(self._decoder.mode(), Streaming):
            return None
        if self._buffer is None:
            return 0
        return max(len(self._buffer) - self._idx, 0)

    def total_duration(self) -> Optional[float]:
        return self._decoder.total_duration()

    # -- iteration ---------------------------------------------------------

    def __iter__(self) -> "QoaPcmSource":
        return self

    def _pull_frame(self) -> bool:
        """Stage the next frame's samples; False at end or on error."""
        try:
            if self._next_frame is not None:
                frame, self._next_frame = self._next_frame, None
            else:
                frame = self._decoder.next_frame()
        except Exception:
            return False  # errors stop iteration (src/lib.rs:951,958)
        if frame is None:
            return False
        _, samples = frame
        self._buffer = samples
        self._idx = 0
        return True

    def __next__(self) -> int:
        if self._finished:
            raise StopIteration
        while self._buffer is None or self._idx >= len(self._buffer):
            self._buffer = None
            if not self._pull_frame():
                self._finished = True
                raise StopIteration
        s = int(self._buffer[self._idx])
        self._idx += 1
        if self._idx >= len(self._buffer):
            # frame exhausted: prefetch the next header now so channels /
            # sample_rate describe the next sample (src/lib.rs:941-954)
            try:
                self._next_frame = self._decoder.next_frame()
            except Exception:
                self._next_frame = None
        return s

    # -- bulk --------------------------------------------------------------

    def read(self, n: Optional[int] = None) -> np.ndarray:
        """Read up to n interleaved samples (all remaining if None)."""
        chunks = []
        got = 0
        while n is None or got < n:
            if self._buffer is None or self._idx >= len(self._buffer):
                self._buffer = None
                if not self._pull_frame():
                    self._finished = True
                    break
            take = len(self._buffer) - self._idx
            if n is not None:
                take = min(take, n - got)
            chunks.append(self._buffer[self._idx : self._idx + take])
            self._idx += take
            got += take
        if chunks:
            return np.concatenate(chunks)
        return np.empty(0, dtype=np.int16)
