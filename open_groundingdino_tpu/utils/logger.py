"""Process-aware logger + windowed metric meters.

Console logging on process 0, per-process file logging to info.txt — the
semantics of reference util/logger.py:11-73 (colorlog replaced by plain
logging).  MetricLogger mirrors util/misc.py:32-263: windowed medians, ETA,
periodic line printing.
"""
from __future__ import annotations

import datetime
import logging
import os
import sys
import time
from collections import defaultdict, deque
from typing import Dict, Iterable, Optional


def setup_logger(output_dir: Optional[str] = None, name: str = "ogd_tpu",
                 process_index: int = 0) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    if logger.handlers:
        return logger
    fmt = logging.Formatter(
        "%(asctime)s %(levelname)s [%(name)s] %(message)s", "%H:%M:%S"
    )
    if process_index == 0:
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(output_dir, "info.txt"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class SmoothedValue:
    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f}"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def avg(self) -> float:
        return sum(self.deque) / max(len(self.deque), 1)

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    def __str__(self):
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg
        )


class MetricLogger:
    def __init__(self, delimiter: str = "  ", logger: Optional[logging.Logger] = None):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter
        self.logger = logger

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def _print(self, msg: str):
        if self.logger:
            self.logger.info(msg)
        else:
            print(msg)

    def log_every(self, iterable: Iterable, print_freq: int, header: str = ""):
        i = 0
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        end = time.time()
        try:
            total = len(iterable)
        except TypeError:
            total = -1
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0 or i == total - 1:
                if total > 0:
                    eta = iter_time.avg * (total - i - 1)
                    eta_str = str(datetime.timedelta(seconds=int(eta)))
                else:
                    eta_str = "?"
                meters = self.delimiter.join(
                    f"{k}: {v}" for k, v in self.meters.items()
                )
                self._print(
                    f"{header} [{i}/{total}] eta: {eta_str} {meters} "
                    f"iter_t: {iter_time} data_t: {data_time}"
                )
            i += 1
            end = time.time()
        total_time = time.time() - start
        self._print(
            f"{header} done in {datetime.timedelta(seconds=int(total_time))} "
            f"({total_time / max(i, 1):.4f} s/it)"
        )
