"""File + stream logging (mirror of reference utils/utils_logger.py:26-45)."""

from __future__ import annotations

import datetime
import logging


def logger_info(logger_name: str, log_path: str = "default_logger.log") -> None:
    """Idempotently set up a named logger writing to a file and stderr."""
    log = logging.getLogger(logger_name)
    if log.hasHandlers():
        log.info(f"LogHandlers exist! ({logger_name})")
        return
    level = logging.INFO
    formatter = logging.Formatter("%(asctime)s.%(msecs)03d : %(message)s", datefmt="%y-%m-%d %H:%M:%S")
    fh = logging.FileHandler(log_path, mode="a")
    fh.setFormatter(formatter)
    log.setLevel(level)
    log.addHandler(fh)
    sh = logging.StreamHandler()
    sh.setFormatter(formatter)
    log.addHandler(sh)


def timestamp() -> str:
    return datetime.datetime.now().strftime("%y%m%d-%H%M%S")


class logger_print:
    """Tee stdout writes into a log file (reference utils_logger.py:55-65).

    Assign an instance to ``sys.stdout`` to mirror prints into
    ``log_path``; ``close()`` restores nothing (the reference never does),
    it only releases the file handle.
    """

    def __init__(self, log_path: str = "default.log"):
        import sys

        self.terminal = sys.stdout
        self.log = open(log_path, "a")

    def write(self, message: str) -> None:
        self.terminal.write(message)
        self.log.write(message)

    def flush(self) -> None:
        pass

    def close(self) -> None:
        self.log.close()
