"""Structured per-run logging with retention.

Reference ``utils.py:25-52``: a file sink per run, the file named by
Hong-Kong-local start time, INFO level, ``retention="14 days"``, plus a
console sink.  Same surface here with the stdlib: one JSONL log file
per run under ``logs/``, HK-time-stamped name, retention pruning of old
run logs at startup, and an optional stderr echo.  The clock is
injectable so tests (and the deterministic flagship) produce stable
file names.

The crawl loop writes one structured record per round (the RoundMetrics
fields + lineage digest) — T5 counters land both in the checkpoint
manifest (resume state) and here (operational history)."""

from __future__ import annotations

import datetime as _dt
import json
import os
import sys

_HK = _dt.timezone(_dt.timedelta(hours=8))
RETENTION_DAYS = 14


def _hk_now() -> _dt.datetime:
    return _dt.datetime.now(tz=_HK)


class RunLogger:
    def __init__(
        self,
        log_dir: str,
        retention_days: int = RETENTION_DAYS,
        now: _dt.datetime | None = None,
        echo: bool = False,
    ):
        self.log_dir = log_dir
        self.echo = echo
        os.makedirs(log_dir, exist_ok=True)
        start = now or _hk_now()
        if start.tzinfo is not None:
            start = start.astimezone(_HK)
        self._start = start
        self.path = os.path.join(
            log_dir, start.strftime("%Y-%m-%d_%H-%M-%S") + ".log"
        )
        self._prune(retention_days)
        self._fh = open(self.path, "a", encoding="utf-8")

    def _prune(self, retention_days: int) -> None:
        """Drop run logs older than the retention window (file name IS
        the run's start time — the reference's loguru retention)."""
        cutoff = self._start - _dt.timedelta(days=retention_days)
        for name in os.listdir(self.log_dir):
            if not name.endswith(".log"):
                continue
            try:
                ts = _dt.datetime.strptime(
                    name[: -len(".log")], "%Y-%m-%d_%H-%M-%S"
                ).replace(tzinfo=_HK)
            except ValueError:
                continue
            if ts < cutoff:
                try:
                    os.remove(os.path.join(self.log_dir, name))
                except OSError:
                    pass

    def log(self, event: str, level: str = "INFO", **fields) -> None:
        rec = {"level": level, "event": event, **fields}
        line = json.dumps(rec, sort_keys=True, default=str)
        self._fh.write(line + "\n")
        self._fh.flush()
        if self.echo:
            print(line, file=sys.stderr)

    def info(self, event: str, **fields) -> None:
        self.log(event, "INFO", **fields)

    def close(self) -> None:
        self._fh.close()
