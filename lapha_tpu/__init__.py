"""LaPha-TPU: TPU-native framework for Latent Poincaré Shaping for Agentic RL.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
fudan-generative-vision/LaPha (AlphaZero-style LLM agent training with
hyperbolic latent reward shaping), built TPU-first:

- ``lapha_tpu.ops``       — hyperbolic geometry core + Pallas kernels
- ``lapha_tpu.models``    — Qwen2-family decoder in JAX + linear value head
- ``lapha_tpu.parallel``  — device mesh / GSPMD sharding rules
- ``lapha_tpu.engine``    — TPU-native batched generation engine (vLLM replacement)
- ``lapha_tpu.search``    — host-side MCTS with device-resident latent bank
- ``lapha_tpu.train``     — GRPO + value-MSE trainer on a pjit mesh
- ``lapha_tpu.tools``     — sandboxed python tool executor + HTTP RPC
- ``lapha_tpu.evalsuite`` — graders, rollout CLI, scorer (reference-compatible)
"""

__version__ = "0.1.0"


def apply_platform_env() -> None:
    """Honor JAX_PLATFORMS even when a site plugin re-forces its platform.

    Some environments register a PJRT plugin from sitecustomize and pin
    jax_platforms at import time; calling this before first device use makes
    the env var win (e.g. JAX_PLATFORMS=cpu for host-only CLI runs).
    """
    import os

    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass
    enable_compilation_cache()


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache (first TPU compiles are ~30-60 s;
    repeated CLI invocations reuse them).

    ``LAPHA_NO_COMPILE_CACHE=1`` turns this into a no-op — the test suite
    sets it (tests/conftest.py): persisting every >1 s CPU test compile
    is wasted work, and stale entries have crashed test runs (below).

    CPU backends get a HOST-FINGERPRINTED subdirectory: XLA:CPU caches
    AOT executables compiled for the build machine's exact CPU features,
    and this project's sessions migrate across heterogeneous VMs —
    loading another host's AOT result warns "could lead to execution
    errors such as SIGILL" and has produced real segfaults inside
    compilation_cache get/put. TPU entries stay in the base dir (device
    executables target the chip, and they are the multi-minute compiles
    worth keeping across sessions)."""
    import os

    if os.environ.get("LAPHA_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = path or os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/lapha_jax_cache"))
        # derive the intended platform WITHOUT initializing the backend
        # (jax.default_backend() would finalize platform selection here —
        # and block for minutes on a dead remote-TPU tunnel)
        plat = (os.environ.get("JAX_PLATFORMS")
                or (jax.config.jax_platforms or "")).lower()
        if path is None and "cpu" in plat:
            import hashlib
            import platform as _plat

            ident = _plat.machine() + f":{os.cpu_count()}"
            try:
                # flags AND model name AND stepping/microcode/core count:
                # two VM generations can expose the same /proc flags+model
                # lines while LLVM host-detects different feature sets
                # (amx-complex, prefer-no-gather tunings…) — seen twice as
                # cross-VM AOT loads that deadlock collectives or risk
                # SIGILL, so over-discriminate rather than under
                with open("/proc/cpuinfo") as f:
                    lines = f.readlines()
                for key in ("flags", "Features", "model name", "stepping",
                            "microcode", "cpu family", "cpu cores"):
                    ident += next((l for l in lines if l.startswith(key)), "")
            except OSError:
                pass
            try:
                # even the full cpuinfo surface has collided across VM
                # generations (LLVM host-detects different tunings —
                # prefer-no-gather/scatter — from identical flags lines;
                # a third cross-VM AOT load was observed round 4). Scope
                # CPU entries to one boot: same-boot reuse (xdist
                # workers, repeated runs) is what actually pays.
                with open("/proc/sys/kernel/random/boot_id") as f:
                    ident += f.read()
            except OSError:
                pass
            fp = hashlib.sha1(ident.encode()).hexdigest()[:12]
            cache_dir = os.path.join(cache_dir, f"cpu-{fp}")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
