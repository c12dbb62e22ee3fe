"""Persistent XLA compilation cache.

The Mohr-Coulomb fused step is a large while-loop program; a cold compile
through this machine's remote TPU compile helper takes 2-7 minutes (high
server-side variance), a cache hit ~15 s.  The reference has no analog (its
FFCx kernels compile in seconds and ccache them); for the TPU build the
persistent cache is what makes iterate-on-the-flagship-model workflows
usable, so the library enables it by default for every entry point.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")

_enabled = False


def _user_cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(os.path.expanduser("~"), ".cache")
    return os.path.join(base, "dolfinx_external_operator_tpu", "jax_cache")


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point JAX at an on-disk compilation cache (idempotent, best-effort).

    Honors an existing ``JAX_COMPILATION_CACHE_DIR`` env var / jax.config
    setting; defaults to ``<repo>/.jax_cache``, falling back to a
    user-writable ``~/.cache`` directory (read-only installs: site-packages,
    containers).  Never raises — on total failure the package imports fine
    with the persistent cache simply disabled."""
    global _enabled
    import jax

    if _enabled:
        return jax.config.jax_compilation_cache_dir
    target = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or jax.config.jax_compilation_cache_dir
        or _DEFAULT
    )
    try:
        os.makedirs(target, exist_ok=True)
    except OSError:
        target = _user_cache_dir()
        try:
            os.makedirs(target, exist_ok=True)
        except OSError:
            import warnings

            warnings.warn(
                "dolfinx_external_operator_tpu: no writable location for the "
                "persistent XLA compilation cache; continuing without one "
                "(cold TPU compiles of the fused step take minutes)",
                stacklevel=2,
            )
            return None
    jax.config.update("jax_compilation_cache_dir", target)
    # cache every nontrivial program: the default 1s floor skips small
    # kernels whose recompiles still add up across a 100-step demo
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return target
