"""Progress reporting for chunk runs (A15; reference BatchChunker.pm:404-483
uses Term::ProgressBar with ETA, silenced when non-interactive).

`ProgressPrinter` is a dependency-free renderer wired through the chunker's
``on_progress``/``on_message`` hooks: a single-line bar with percentage and
ETA on a TTY, quiet otherwise (matching the reference's non-interactive
silence), with messages always passed through.
"""

from __future__ import annotations

import re
import sys
import time
from typing import Optional, TextIO

# ---------------------------------------------------------------------------
# Number formatting for status lines (A15; reference BatchChunker.pm:1686-1745
# uses CLDR::Number formatters — default locale 'en', caller-replaceable
# (BatchChunker.pm:452-465) — and compacts spacing once IDs exceed 1e9, since
# wide IDs would otherwise blow out the fixed-width columns).
# ---------------------------------------------------------------------------
WIDE_ID = 1_000_000_000


class NumberLocale:
    """CLDR decimal/percent symbols for one locale — the slice of
    CLDR::Number the status lines actually consume (group separator,
    decimal separator, gap between a number and the percent sign, digit
    GROUPING SIZES — CLDR patterns allow a distinct primary/secondary
    group, e.g. Indian numbering's ``#,##,##0`` → 12,34,56,789). Data
    from the public Unicode CLDR charts; register more locales by adding
    to :data:`CLDR_LOCALES` or passing an instance directly."""

    __slots__ = ("group", "decimal", "percent_gap", "groups")

    def __init__(
        self,
        group: str,
        decimal: str,
        percent_gap: str = "",
        groups: "tuple[int, ...]" = (3,),
    ) -> None:
        self.group = group
        self.decimal = decimal
        self.percent_gap = percent_gap
        # (primary,) or (primary, secondary): primary sizes the rightmost
        # group, secondary repeats leftward (CLDR decimal pattern grammar)
        self.groups = groups


CLDR_LOCALES = {
    # Percent gaps are U+00A0 no-break space and the French group separator
    # is U+202F narrow no-break space, per the published CLDR symbol charts.
    "en": NumberLocale(",", "."),
    "de": NumberLocale(".", ",", " "),
    "fr": NumberLocale(" ", ",", " "),
    "es": NumberLocale(".", ",", " "),
    "it": NumberLocale(".", ","),
    "ja": NumberLocale(",", "."),
    # Indian numbering: primary group 3, then 2s (CLDR pattern #,##,##0)
    "hi": NumberLocale(",", ".", groups=(3, 2)),
    "en-IN": NumberLocale(",", ".", groups=(3, 2)),
}


def _locale(locale: "str | NumberLocale") -> NumberLocale:
    if isinstance(locale, NumberLocale):
        return locale
    try:
        return CLDR_LOCALES[locale]
    except KeyError:
        raise ValueError(
            f"unknown locale {locale!r}; known: {sorted(CLDR_LOCALES)} — "
            "pass a NumberLocale for anything else"
        ) from None


def format_int(
    n: int, sep: Optional[str] = None, locale: "str | NumberLocale" = "en"
) -> str:
    """Grouped integer per the locale's CLDR decimal pattern, including
    non-uniform grouping (hi/en-IN: primary 3 then repeating 2s). ``sep``
    (pre-locale API) overrides the locale's group separator."""
    loc = _locale(locale)
    group = sep if sep is not None else loc.group
    if loc.groups == (3,):
        return f"{n:,}".replace(",", group)
    sign, digits = ("-", str(-n)) if n < 0 else ("", str(n))
    primary, secondary = loc.groups[0], loc.groups[-1]
    parts, i, size = [], len(digits), primary
    while i > 0:
        parts.append(digits[max(0, i - size) : i])
        i -= size
        size = secondary
    return sign + group.join(reversed(parts))


def format_decimal(
    x: float, digits: int = 2, locale: "str | NumberLocale" = "en"
) -> str:
    """Fixed-fraction decimal (CLDR decimal formatter with min=max fraction
    digits, reference BatchChunker.pm:1689-1692)."""
    loc = _locale(locale)
    return f"{x:.{digits}f}".replace(".", loc.decimal)


def format_percent(frac: float, locale: "str | NumberLocale" = "en") -> str:
    """Integer percent, CLDR percent-formatter default (0.85 → '85%';
    locales like de/fr put a no-break space before the sign)."""
    loc = _locale(locale)
    return f"{round(frac * 100):.0f}{loc.percent_gap}%"


def chunk_status_line(
    start: int,
    end: int,
    action: str,
    chunk_count: Optional[int],
    chunk_size: int,
    runtime: Optional[float] = None,
    sleep: float = 0.0,
    locale: "str | NumberLocale" = "en",
) -> str:
    """Reference-uniform chunk status line (BatchChunker.pm:1694-1741).

    IDs below 1e9 render in fixed-width columns with grouped row counts;
    at/above 1e9 the raw (ungrouped) IDs are printed, and STRICTLY above
    1e9 runs of spaces are additionally compacted so 41-digit cursors stay
    on one readable line (exactly 1e9 is unpadded but uncompacted — see the
    parity note at the compaction site below).
    """
    wide = start >= WIDE_ID or end >= WIDE_ID
    if chunk_count is None:
        count_display = "?"
    elif wide:
        count_display = str(chunk_count)
    else:
        count_display = format_int(chunk_count, locale=locale)
    if wide:
        msg = f"IDs {start} to {end} {action}, {count_display} rows found"
    else:
        msg = f"IDs {start:6d} to {end:6d} {action:>9s}, {count_display:>9s} rows found"
    if chunk_count:
        msg += f" ({format_percent(chunk_count / chunk_size, locale=locale):>4s} of chunk size)"
    if action == "processed" and runtime is not None:
        if sleep:
            msg += (
                f", {format_decimal(runtime, locale=locale):>5s}"
                f"+{format_decimal(sleep, locale=locale)}"
                " sec runtime+sleep"
            )
        else:
            msg += f", {format_decimal(runtime, locale=locale):>5s} sec runtime"
    # Reference parity (BatchChunker.pm:1663-1745): the unpadded format kicks
    # in when IDs are NOT < 1e9, but whitespace compaction only when they are
    # STRICTLY > 1e9 — an ID of exactly 1_000_000_000 renders unpadded yet
    # uncompacted.
    if start > WIDE_ID or end > WIDE_ID:
        msg = re.sub(r"\s+", " ", msg)
        msg = re.sub(r"\(\s+", "(", msg)
    return msg


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
