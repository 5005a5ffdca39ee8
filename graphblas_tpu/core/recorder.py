"""Recorder: capture the engine operations issued by a region of code.

Reference: /root/reference/graphblas/core/recorder.py:34-183 records C calls
as compilable GraphBLAS C text via a ContextVar consulted in ``call()``
(core/base.py:14-15,51-53).  Here the recorded lines are engine-op
invocations (op family, operator, operand names/shapes) — the trace of what
was dispatched to XLA.
"""

import contextvars
import itertools

_recorder = contextvars.ContextVar("recorder", default=None)


def record(opname, details):
    rec = _recorder.get()
    if rec is not None and rec.is_recording:
        rec.data.append(f"{opname}({details});")


class Recorder:
    """Record engine calls.  Usable as a context manager or start/stop."""

    def __init__(self, *, start=True, max_rows=20):
        self.data = []
        self.max_rows = max_rows
        self._is_recording = False
        self._token = None
        if start:
            self.start()

    @property
    def is_recording(self):
        return self._is_recording

    def start(self):
        if not self._is_recording:
            self._is_recording = True
            self._token = _recorder.set(self)

    def stop(self):
        if self._is_recording:
            self._is_recording = False
            if self._token is not None:
                _recorder.reset(self._token)
                self._token = None

    def clear(self):
        self.data.clear()

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()
        return False

    def __iter__(self):
        return iter(self.data)

    def __len__(self):
        return len(self.data)

    def __repr__(self):
        lines = self.data
        if len(lines) > self.max_rows:
            head = lines[: self.max_rows // 2]
            tail = lines[-(self.max_rows // 2) :]
            lines = [*head, f"... ({len(self.data) - len(head) - len(tail)} more)", *tail]
        status = "recording" if self._is_recording else "stopped"
        body = "\n".join(f"  {line}" for line in lines)
        return f"graphblas_tpu.Recorder ({status})\n{body}"

    def _repr_markdown_(self):
        body = "\n".join(self.data)
        return f"```\n{body}\n```"


class skip_record:
    """Null-object recorder (reference: core/recorder.py:181-183)."""

    is_recording = False
    data = ()
