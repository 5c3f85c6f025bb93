"""Host-side compute scope.

Graph construction, initialization, and other per-factor bookkeeping evaluate
small eager jnp expressions (manifold compose/exp/log on single points). On an
accelerator backend every eager op is a device round-trip — catastrophic over
a remote-tunnel TPU (observed ~60 s/factor for graph init). These are
host-side code paths by design, so pin them to the CPU backend; the solver's
batched/jitted kernels are unaffected and stay on the accelerator.
"""

from __future__ import annotations

import contextlib
import functools


@contextlib.contextmanager
def host_default_device():
    """Context that makes eager jnp ops execute on the host CPU backend."""
    import jax

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:  # pragma: no cover — no CPU backend registered
        yield
        return
    with jax.default_device(cpu):
        yield


def on_host(fn):
    """Decorator form of :func:`host_default_device`."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with host_default_device():
            return fn(*args, **kwargs)

    return wrapped
