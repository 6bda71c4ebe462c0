from vickers_tpu.train.loop import run, set_seed

__all__ = ["run", "set_seed"]
