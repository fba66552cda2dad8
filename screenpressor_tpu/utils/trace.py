"""Symbol-level lockstep tracing.

Reference analog: the `DO_LOG`/`lprintf` paired encode/decode traces used to
find model desyncs (`logging.h:5-13`, e.g. `screencap.cpp:612-678`). Here: a
process-global recorder the spec coder feeds; `diff_traces` pinpoints the
first diverging sub-symbol between an encoder run and a decoder run.
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass, field

_ACTIVE: list["SymbolTrace"] = []


@dataclass
class SymbolTrace:
    events: list = field(default_factory=list)

    def record(self, step: int, substep: int, lane: int, kind: str, row: int,
               sym: int, cum: int, freq: int):
        self.events.append((step, substep, lane, kind, row, sym, cum, freq))


@contextlib.contextmanager
def capture():
    """Capture (step, substep, lane, kind, row, sym, cum, freq) events from
    any spec section coder running inside the context."""
    tr = SymbolTrace()
    _ACTIVE.append(tr)
    try:
        yield tr
    finally:
        _ACTIVE.remove(tr)


def emit(step, substep, lane, kind, row, sym, cum, freq):
    for tr in _ACTIVE:
        tr.record(step, substep, lane, kind, row, sym, cum, freq)


def diff_traces(enc: SymbolTrace, dec: SymbolTrace):
    """First event where encoder and decoder disagree, or None."""
    for i, (a, b) in enumerate(zip(enc.events, dec.events)):
        if a != b:
            return i, a, b
    if len(enc.events) != len(dec.events):
        n = min(len(enc.events), len(dec.events))
        longer = enc.events if len(enc.events) > n else dec.events
        return n, longer[n], None
    return None
