from . import tg51, trs398

__all__ = ["tg51", "trs398"]
