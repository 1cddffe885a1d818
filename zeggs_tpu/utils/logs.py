"""Logger factory, progress/ETA bars, and console tables.

Covers the reference's logging infrastructure (ZEGGS/audio/logs.py:9-458:
console/file logger factory, multiprocess-safe proxies, progress reporting;
ZEGGS/helpers.py:40-56: percent bar + ETA line) without the `rich`
dependency — plain stdlib so it works in minimal TPU pods.
"""

from __future__ import annotations

import datetime
import logging
import multiprocessing as mp
import sys
from pathlib import Path

_FMT = "%(asctime)s [%(levelname)s] %(name)s: %(message)s"


def get_logger(name="zeggs_tpu", level=logging.INFO, log_file=None, console=True):
    """Console and/or file logger; repeated calls reuse handlers."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.propagate = False
    have = {type(h).__name__ for h in logger.handlers}
    if console and "StreamHandler" not in have:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(_FMT))
        logger.addHandler(h)
    if log_file is not None and "FileHandler" not in have:
        Path(log_file).parent.mkdir(parents=True, exist_ok=True)
        h = logging.FileHandler(log_file)
        h.setFormatter(logging.Formatter(_FMT))
        logger.addHandler(h)
    return logger


def get_logger_from_arg(logger=None):
    """Normalize a logger argument: None/str -> logger instance
    (audio/logs.py get_logger_from_arg semantics)."""
    if logger is None or isinstance(logger, str):
        return get_logger(logger or "zeggs_tpu")
    return logger


class QueueLogger:
    """Multiprocess-safe logger proxy: workers push records onto a queue,
    the parent drains them (the reference's FakeLogger pattern,
    audio/logs.py:291-380)."""

    def __init__(self, queue=None):
        self.queue = queue if queue is not None else mp.Manager().Queue()

    def _put(self, level, msg):
        self.queue.put((level, str(msg)))

    def debug(self, msg):
        self._put("debug", msg)

    def info(self, msg):
        self._put("info", msg)

    def warning(self, msg):
        self._put("warning", msg)

    def error(self, msg):
        self._put("error", msg)

    def drain(self, target_logger=None):
        target = get_logger_from_arg(target_logger)
        while not self.queue.empty():
            level, msg = self.queue.get_nowait()
            getattr(target, level)(msg)


class ConsolePrintLogger:
    """print()-backed logger stand-in (audio/logs.py:383-458)."""

    def debug(self, msg):
        print(msg)

    def info(self, msg):
        print(msg)

    def warning(self, msg):
        print(f"WARNING: {msg}")

    def error(self, msg):
        print(f"ERROR: {msg}", file=sys.stderr)


def percent_bar(ratio=1.0, width=30, empty=" ", done="#", parts=" -=>"):
    """ASCII progress bar (helpers.py:40-47)."""
    if ratio >= 1.0:
        return done * width
    filled = int((100 * ratio) // (100 / width))
    part_idx = int(len(parts) * (((100 * ratio) / (100 / width)) % 1.0))
    return (
        done * filled
        + parts[part_idx]
        + empty * max(width - filled - 1, 0)
    )


def progress(epoch, iteration, batch_index, train_err, iter_num, start_time):
    """One-line training progress + ETA (helpers.py:50-56)."""
    ratio = (float(batch_index) + 1) / iter_num
    now = datetime.datetime.now()
    eta = start_time + (1.0 / (ratio + 1e-10)) * (now - start_time)
    return "| %5i | %6i | [%s] %6.2f%% | % 8.4f | %s |" % (
        epoch, iteration, percent_bar(ratio), 100 * ratio, train_err, str(eta)[11:19],
    )


def ascii_table(headers, rows, title=None):
    """Plain-text table (replaces the reference's rich tables)."""
    cols = [headers] + [[str(c) for c in r] for r in rows]
    widths = [max(len(r[i]) for r in cols) for i in range(len(headers))]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = []
    if title:
        out.append(title)
    out.append(sep)
    out.append("| " + " | ".join(h.ljust(w) for h, w in zip(headers, widths)) + " |")
    out.append(sep)
    for r in cols[1:]:
        out.append("| " + " | ".join(c.ljust(w) for c, w in zip(r, widths)) + " |")
    out.append(sep)
    return "\n".join(out)
