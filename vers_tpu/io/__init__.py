from vers_tpu.io.bincode import Reader, Writer

__all__ = ["Reader", "Writer"]
