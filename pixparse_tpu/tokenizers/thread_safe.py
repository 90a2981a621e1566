"""Thread-local tokenizer wrapper.

HF fast tokenizers wrap a Rust object that is NOT thread-safe: concurrent
``__call__`` with differing truncation/padding raises ``RuntimeError: Already
borrowed``. The reference dodges this with torch DataLoader *process* workers;
our loader uses threads (PIL/tokenizers release the GIL), so each thread gets
its own deep copy here. The base tokenizer must be fully configured (special
tokens added) before wrapping — copies snapshot it lazily per thread.
"""

from __future__ import annotations

import copy
import threading


class ThreadLocalTokenizer:
    """Delegates every call/attribute to a per-thread deep copy of ``base``."""

    def __init__(self, base):
        object.__setattr__(self, "_base", base)
        object.__setattr__(self, "_tl", threading.local())

    def _get(self):
        tok = getattr(self._tl, "tok", None)
        if tok is None:
            tok = copy.deepcopy(self._base)
            self._tl.tok = tok
        return tok

    def __call__(self, *args, **kwargs):
        return self._get()(*args, **kwargs)

    def __getattr__(self, name):
        return getattr(self._get(), name)

    def __len__(self):
        return len(self._get())

    def __deepcopy__(self, memo):
        # copying the wrapper yields a plain tokenizer copy
        return copy.deepcopy(self._base, memo)
