"""Persistent XLA compilation cache.

The 1.4B-trunk sampler costs minutes of XLA compile per (batch, length)
bucket; enabling jax's persistent cache makes every subsequent process reuse
them.  Called by the CLIs and bench at startup.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str | None:
    cache_dir = cache_dir or os.environ.get(
        "ESMDIFF_COMPILATION_CACHE",
        os.path.expanduser("~/.cache/esmdiff_tpu_xla"),
    )
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        return cache_dir
    except Exception as e:  # cache is an optimization, never fatal
        print(f"[warn] persistent compilation cache unavailable: {e}")
        return None


class CacheEventCounter:
    """Counts persistent-cache hit/miss monitoring events — makes cold-start
    numbers interpretable (PERF.md gotcha #8: executable loads over the
    tunnel vary 227-455 s with a populated cache; bench.py reports whether a
    first call was a cache hit, a miss, or a partial reload)."""

    def __init__(self):
        self.counts: dict[str, int] = {}
        self.durations: dict[str, float] = {}
        self._registered = False

    def install(self) -> "CacheEventCounter":
        try:
            from jax import monitoring

            def _on_event(event: str, **kw):
                if "cache" in event:
                    self.counts[event] = self.counts.get(event, 0) + 1

            def _on_duration(event: str, duration: float, **kw):
                # namespaced so an event reported through both channels can
                # never be double-counted into hits/misses
                if "cache" in event:
                    key = "dur:" + event
                    self.counts[key] = self.counts.get(key, 0) + 1
                    self.durations[key] = (
                        self.durations.get(key, 0.0) + float(duration))

            monitoring.register_event_listener(_on_event)
            # cache misses are recorded as durations (compile time) in jax
            monitoring.register_event_duration_secs_listener(_on_duration)
            self._registered = True
        except Exception:
            pass
        return self

    def snapshot(self) -> dict:
        base = {k: v for k, v in self.counts.items()
                if not k.startswith("dur:")}
        dur = {k[4:]: v for k, v in self.counts.items()
               if k.startswith("dur:")}
        merged = {**dur, **base}  # event channel wins if both ever fire
        hits = sum(v for k, v in merged.items() if "hit" in k)
        misses = sum(v for k, v in merged.items() if "miss" in k)
        # where the warmup wall actually went: seconds spent retrieving
        # cached executables vs compile time the cache claims it saved
        # (diagnoses retrieval-slower-than-recompile pathologies over the
        # axon tunnel — PERF.md gotcha #8)
        secs = {k[4:].rsplit("/", 1)[-1]: round(v, 1)
                for k, v in self.durations.items()}
        return {"cache_hits": hits, "cache_misses": misses,
                "seconds": secs,
                "events": dict(self.counts), "listener": self._registered}
