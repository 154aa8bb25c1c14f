"""Run logging: timestamped tee of stdout/stderr to log files.

Reference semantics: beta_rec/utils/logger.py:60-110 (stdout/stderr hijack into
``.stdout.log`` / ``.stderr.log``). This version keeps the original streams working
and is re-entrant (calling init twice replaces the files, not the tee chain).
"""

import datetime
import logging
import os
import sys

from .common import ensure_dir


def get_logger(name="beta_recsys_tpu", level=logging.INFO):
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
        )
        logger.addHandler(handler)
    logger.setLevel(level)
    return logger


class _TeeStream:
    """File-like object that timestamps lines and tees to a file + original stream."""

    def __init__(self, stream, file_path):
        self.stream = stream
        self.file = open(file_path, "a", buffering=1)
        self._at_line_start = True

    def write(self, text):
        self.stream.write(text)
        for chunk in text.splitlines(keepends=True):
            if self._at_line_start and chunk.strip():
                ts = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
                self.file.write(f"[{ts}] ")
            self.file.write(chunk)
            self._at_line_start = chunk.endswith("\n")

    def flush(self):
        self.stream.flush()
        self.file.flush()

    def isatty(self):
        return False

    def close(self):
        self.file.close()


class Logger:
    """Install timestamping tee streams over stdout/stderr for a run."""

    def __init__(self, log_dir, run_id):
        ensure_dir(log_dir)
        base = os.path.join(log_dir, run_id)
        self.stdout_path = base + ".stdout.log"
        self.stderr_path = base + ".stderr.log"
        self._orig_out, self._orig_err = sys.stdout, sys.stderr
        sys.stdout = _TeeStream(self._orig_out, self.stdout_path)
        sys.stderr = _TeeStream(self._orig_err, self.stderr_path)

    def restore(self):
        if isinstance(sys.stdout, _TeeStream):
            sys.stdout.close()
        if isinstance(sys.stderr, _TeeStream):
            sys.stderr.close()
        sys.stdout, sys.stderr = self._orig_out, self._orig_err
