from .idempotent_sink import append_if_absent

__all__ = ["append_if_absent"]
