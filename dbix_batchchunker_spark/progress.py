"""Progress reporting for chunk runs (A15; reference BatchChunker.pm:404-483
uses Term::ProgressBar with ETA, silenced when non-interactive).

`ProgressPrinter` is a dependency-free renderer wired through the chunker's
``on_progress``/``on_message`` hooks: a single-line bar with percentage and
ETA on a TTY, quiet otherwise (matching the reference's non-interactive
silence), with messages always passed through.
"""

from __future__ import annotations

import sys
import time
from typing import Optional, TextIO


class ProgressPrinter:
    def __init__(
        self,
        name: str = "Processing",
        stream: Optional[TextIO] = None,
        force: bool = False,
        width: int = 30,
    ) -> None:
        self.name = name
        self.stream = stream if stream is not None else sys.stderr
        self.enabled = force or (hasattr(self.stream, "isatty") and self.stream.isatty())
        self.width = width
        self.start_time = time.monotonic()
        self._last_render = 0.0

    # wire as BatchChunker(on_progress=p.on_progress, on_message=p.on_message)
    def on_progress(self, done: int, total: int) -> None:
        if not self.enabled or total <= 0:
            return
        now = time.monotonic()
        if now - self._last_render < 0.1 and done < total:
            return
        self._last_render = now
        frac = min(1.0, done / total)
        filled = int(frac * self.width)
        elapsed = now - self.start_time
        eta = (elapsed / frac - elapsed) if frac > 0 else 0.0
        bar = "=" * filled + ">" + " " * (self.width - filled)
        self.stream.write(
            f"\r{self.name}: [{bar}] {frac:6.1%} ({done:,}/{total:,}) ETA {eta:5.1f}s"
        )
        if done >= total:
            self.stream.write("\n")
        self.stream.flush()

    def on_message(self, msg: str) -> None:
        if self.enabled:
            self.stream.write("\r\x1b[K")  # clear the bar line first
        self.stream.write(msg + "\n")
        self.stream.flush()
