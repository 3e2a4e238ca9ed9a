"""joliGEN-TPU: TPU-native (JAX/XLA/Pallas) image & video generative
training + inference framework with the capabilities of jolibrain/joliGEN.

Model families: GANs (CUT/CycleGAN), DDPM diffusion (Palette),
consistency/flow models (CM/ECT, shortcut, B2B flow matching), and
mask-aware inpainting transformers — with semantic-preserving losses,
online bbox-crop dataset creation, and a REST serving API.
"""

__version__ = "0.1.0"


def _enable_compilation_cache():
    """Persistent XLA compilation cache (huge win with remote-compile TPU
    tunnels where every fresh compile is a network round-trip)."""
    import os
    cache = os.environ.get("JOLIGEN_JAX_CACHE",
                           os.path.join(os.path.dirname(__file__), "..",
                                        ".jax_cache"))
    try:
        # key the cache by host CPU features: XLA:CPU AOT artifacts are
        # machine-specific, and loading another host's entries risks SIGILL
        # (cpu_aot_loader warnings observed when the repo moves machines)
        import hashlib
        import platform
        tag = platform.machine()
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        tag += hashlib.md5(line.encode()).hexdigest()[:8]
                        break
        except OSError:
            pass
        cache = os.path.join(cache, tag)
        import jax
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()


def _respect_platform_env():
    """Honor JAX_PLATFORMS=cpu even on hosts whose sitecustomize force-selects
    the TPU plugin after env parsing (it rewrites jax_platforms at import)."""
    import os
    want = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if want == "cpu":
        import jax
        if jax.config.jax_platforms != "cpu":
            jax.config.update("jax_platforms", "cpu")


_respect_platform_env()
