"""Environment compatibility shims.

``fsspec.implementations.http`` cannot import in this environment (aiohttp is
absent). Ray Data's ``_is_http_filesystem`` probes that import on EVERY
read/write path resolution and catches only ``ModuleNotFoundError`` — but
when two driver threads resolve paths concurrently, one can observe the
other's partially-initialized module and get a plain ``ImportError``
("cannot import name 'HTTPFileSystem'"), crashing the pipeline
(ray/data/datasource/path_util.py:153, Ray 2.49.2).

Fix: if the real import fails, install a stub module exposing an
``HTTPFileSystem`` class nothing instantiates or is an instance of. The
probe import then succeeds deterministically (thread-safe: no repeated
failed-import/retry cycle) and every ``isinstance`` check is False —
identical behavior to the ModuleNotFoundError path, minus the race.
"""

from __future__ import annotations

import sys
import types


def patch_fsspec_http_race() -> None:
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401

        return  # real module importable; nothing to do
    except Exception:
        pass

    name = "fsspec.implementations.http"
    if name in sys.modules:
        return
    mod = types.ModuleType(name)

    class HTTPFileSystem:  # stub — aiohttp is unavailable in this env
        def __init__(self, *args, **kwargs):
            raise ModuleNotFoundError(
                "aiohttp is not installed (fsspec HTTP stubbed by quickner_ray)"
            )

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules[name] = mod
    try:
        import fsspec.implementations as _fi

        _fi.http = mod
    except Exception:
        pass
