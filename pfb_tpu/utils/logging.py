"""Per-module loggers with per-run file logging.

Equivalent of the reference's pyscilog usage (pyscilog.init('pfb'),
get_logger per module, log_to_file per run — workers/*.py preambles).
Thin wrapper over the stdlib so worker output lands both on the console
and in a timestamped log file.
"""

import logging
import sys
import time

_ROOT = "pfb_tpu"
_file_handler = None


def get_logger(name: str) -> logging.Logger:
    log = logging.getLogger(f"{_ROOT}.{name}")
    if not logging.getLogger(_ROOT).handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(
            "%(asctime)s - %(name)s - %(levelname)s | %(message)s",
            datefmt="%H:%M:%S"))
        root = logging.getLogger(_ROOT)
        root.addHandler(h)
        root.setLevel(logging.INFO)
    return log


def log_to_file(filename: str = None, prefix: str = "pfb"):
    """Attach a per-run file handler (reference: pyscilog.log_to_file,
    e.g. klean_<timestamp>.log)."""
    global _file_handler
    root = logging.getLogger(_ROOT)
    if _file_handler is not None:
        root.removeHandler(_file_handler)
    if filename is None:
        filename = f"{prefix}_{time.strftime('%Y%m%d-%H%M%S')}.log"
    _file_handler = logging.FileHandler(filename)
    _file_handler.setFormatter(logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s | %(message)s"))
    root.addHandler(_file_handler)
    return filename
