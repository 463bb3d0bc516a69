from .runtime import run_streaming  # noqa: F401
