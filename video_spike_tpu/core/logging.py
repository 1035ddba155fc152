"""Rich console logging with a colored header and process-0 gating.

Capability parity with ``/root/reference/src/utils/log_utils.py:16-144``:
a `logging(header=..., header_color=...)` object exposing info/warning/error/
debug, silent on non-primary hosts of a multi-process JAX run.
"""

from __future__ import annotations

import logging as pylogging
import sys

try:
    from rich.logging import RichHandler

    _HAVE_RICH = True
except Exception:  # pragma: no cover
    _HAVE_RICH = False

import jax


def _is_primary() -> bool:
    try:
        return jax.process_index() == 0
    except Exception:  # uninitialized distributed runtime
        return True


_CONFIGURED = False


def _configure_root(level=pylogging.INFO) -> None:
    global _CONFIGURED
    if _CONFIGURED:
        return
    handlers = []
    if _HAVE_RICH and sys.stderr.isatty():
        handlers.append(RichHandler(rich_tracebacks=True, show_path=False))
        fmt = "%(message)s"
    else:
        handlers.append(pylogging.StreamHandler())
        fmt = "%(asctime)s %(levelname)s %(message)s"
    pylogging.basicConfig(level=level, format=fmt, handlers=handlers, force=True)
    # third-party chatter (orbax prints ~15 INFO lines per checkpoint)
    for noisy in ("orbax", "absl", "jax._src", "urllib3"):
        pylogging.getLogger(noisy).setLevel(pylogging.WARNING)
    _CONFIGURED = True


class logging:  # noqa: N801 — keep the reference's lowercase class name
    """Named logger with a decorative header, main-process gated."""

    def __init__(self, header: str = "[vstpu]", header_color: str = "#7aa2f7",
                 level=pylogging.INFO):
        _configure_root(level)
        self.header = header
        self.header_color = header_color
        self._log = pylogging.getLogger("video_spike_tpu")
        self._log.setLevel(level)
        self._primary = _is_primary()

    def _fmt(self, msg: str) -> str:
        if _HAVE_RICH:
            return f"[{self.header_color}]{self.header}[/] {msg}"
        return f"{self.header} {msg}"

    def info(self, msg: str) -> None:
        if self._primary:
            self._log.info(self._fmt(msg), extra={"markup": True})

    def warning(self, msg: str) -> None:
        if self._primary:
            self._log.warning(self._fmt(msg), extra={"markup": True})

    def error(self, msg: str) -> None:
        # errors print on every process — they matter for debugging SPMD runs
        self._log.error(self._fmt(msg), extra={"markup": True})

    def debug(self, msg: str) -> None:
        if self._primary:
            self._log.debug(self._fmt(msg), extra={"markup": True})
