from .pending_stream import pending_stream, run_available_now  # noqa: F401
