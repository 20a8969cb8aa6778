"""Scratch-directory lifecycle for gate entries.

Gate entries create scratch dirs as side effects (JSONL roundtrips,
simulated broker logs, streaming state roots).  Raw ``tempfile.mkdtemp``
leaks one dir per invocation for the life of the process — harmless for a
one-shot driver run, but a long-lived session (notebook, the driver
running entries repeatedly, bench re-measure loops) accumulates them.
``scratch_dir`` registers every dir for removal at interpreter exit, so
repeated entry invocations stay disk-bounded without each call site
managing cleanup.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_DIRS: list[str] = []


def scratch_dir(prefix: str) -> str:
    """mkdtemp + register for atexit removal."""
    d = tempfile.mkdtemp(prefix=prefix)
    _DIRS.append(d)
    return d


@atexit.register
def _cleanup() -> None:
    for d in _DIRS:
        shutil.rmtree(d, ignore_errors=True)
    _DIRS.clear()
