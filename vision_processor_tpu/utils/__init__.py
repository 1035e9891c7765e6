from . import log  # noqa: F401

def honor_platform_env() -> None:
    """Re-apply JAX_PLATFORMS from the environment.

    The container's sitecustomize imports jax pinned to the TPU relay before
    user code runs; entry points call this so JAX_PLATFORMS=cpu subprocess
    runs (tests, CI, harness) actually get the CPU backend.
    """
    import os

    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except RuntimeError:
            pass
