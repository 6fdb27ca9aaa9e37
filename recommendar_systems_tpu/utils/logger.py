"""File + stream logging (reference `/root/reference/src/utils/logger.py:13-63`).

Creates ``./log/<model>-<dataset>-<timestamp>.log`` and mirrors records to
stdout, so the companion ``tools/plot_log_metric.py`` can parse per-epoch
metric curves from the same structured lines the reference emits.
"""

from __future__ import annotations

import logging
import os

from recommendar_systems_tpu.utils.misc import get_local_time


def init_logger(config) -> logging.Logger:
    log_root = config.get("log_dir", "./log/")
    os.makedirs(log_root, exist_ok=True)
    logfilename = "{}-{}-{}.log".format(
        config["model"], config["dataset"], get_local_time()
    )
    logfilepath = os.path.join(log_root, logfilename)

    filefmt = "%(asctime)-15s %(levelname)s %(message)s"
    filedatefmt = "%a %d %b %Y %H:%M:%S"

    logger = logging.getLogger()
    logger.setLevel(logging.INFO)
    # reset handlers so repeated quick_start calls do not duplicate output
    for h in list(logger.handlers):
        logger.removeHandler(h)

    fh = logging.FileHandler(logfilepath, encoding="utf-8")
    fh.setLevel(logging.INFO)
    fh.setFormatter(logging.Formatter(filefmt, filedatefmt))
    logger.addHandler(fh)

    sh = logging.StreamHandler()
    sh.setLevel(logging.INFO)
    sh.setFormatter(logging.Formatter("%(asctime)-15s %(levelname)s %(message)s", "%H:%M:%S"))
    logger.addHandler(sh)
    return logger
