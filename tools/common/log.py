"""Default logging setup (parity: /root/reference/tools/common/log.py:4-10)."""
import logging


def setup_default_logging(level: int = logging.INFO) -> None:
    logging.basicConfig(
        level=level,
        format="%(asctime)s | %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
        force=True,
    )
