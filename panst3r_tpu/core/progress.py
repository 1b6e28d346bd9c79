"""Progress routing.

Equivalent of the reference's `TqdmRouter` (/root/reference/src/panst3r/
tqdm.py:9-36): a context-local, thread-safe hook so a UI (e.g. a web demo)
can intercept library-internal progress reporting without the library
knowing about the UI.
"""
from __future__ import annotations

import contextlib
import contextvars
import threading
from typing import Callable, Iterable, Optional

_handler: contextvars.ContextVar[Optional[Callable]] = \
    contextvars.ContextVar("progress_handler", default=None)
_lock = threading.RLock()


def report(iterable: Iterable, desc: str = "", total: Optional[int] = None):
    """Wrap an iterable; routes to the installed handler or tqdm/no-op."""
    handler = _handler.get()
    if handler is not None:
        return handler(iterable, desc=desc, total=total)
    try:
        from tqdm.auto import tqdm

        return tqdm(iterable, desc=desc, total=total, leave=False)
    except Exception:
        return iterable


@contextlib.contextmanager
def route(handler: Callable):
    """Temporarily install a progress handler (thread/context-safe)."""
    with _lock:
        token = _handler.set(handler)
    try:
        yield
    finally:
        with _lock:
            _handler.reset(token)
