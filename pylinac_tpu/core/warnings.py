"""Warning capture machinery (reference ``core/warnings.py``): warnings raised
during ``analyze()`` flow into ``results_data().warnings``."""

from __future__ import annotations

import functools
import threading
import warnings as warning_module


class WarningCollectorMixin:
    """Thread-safe capture + dedup of warnings raised during analysis."""

    _warning_lock = threading.Lock()

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._captured_warnings: list[dict] = []

    def get_captured_warnings(self) -> list[dict]:
        return getattr(self, "_captured_warnings", [])

    def _record_warnings(self, caught) -> None:
        if not hasattr(self, "_captured_warnings"):
            self._captured_warnings = []
        with self._warning_lock:
            for w in caught:
                entry = {
                    "message": str(w.message),
                    "category": w.category.__name__,
                    "filename": w.filename,
                    "lineno": w.lineno,
                }
                if entry not in self._captured_warnings:
                    self._captured_warnings.append(entry)


def capture_warnings_method_wrapper(func):
    """Wrap a method so warnings raised inside are recorded on the instance."""

    @functools.wraps(func)
    def wrapper(self, *args, **kwargs):
        with warning_module.catch_warnings(record=True) as caught:
            warning_module.simplefilter("always")
            result = func(self, *args, **kwargs)
        if isinstance(self, WarningCollectorMixin) or hasattr(self, "_record_warnings"):
            WarningCollectorMixin._record_warnings(self, caught)
        for w in caught:
            warning_module.warn_explicit(w.message, w.category, w.filename, w.lineno)
        return result

    wrapper.__wrapped_for_warnings__ = True
    return wrapper


def capture_warnings(cls):
    """Class decorator: wrap public methods to capture warnings
    (reference ``core/warnings.py:90``).

    Only plain functions are wrapped — classes and other callables stored as
    class attributes (e.g. ``image_type = SomeClass``) must pass through
    untouched."""
    import types

    for name, attr in list(vars(cls).items()):
        if (isinstance(attr, types.FunctionType) and not name.startswith("_")
                and not getattr(attr, "__wrapped_for_warnings__", False)):
            setattr(cls, name, capture_warnings_method_wrapper(attr))
    return cls
