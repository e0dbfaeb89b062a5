"""RenderPipeline — the TPU replacement for renderer.bind_parallel.

The reference wraps (net, renderer) in a module and scatters each ray chunk across
GPUs with torch DataParallel on dim 1 (nerf.py:354-371): replicate module, split
rays, gather outputs on GPU0, every call.  Here the ray axis is *sharded once* via
``NamedSharding`` over a 1-D device mesh; the encoded scene is replicated (it is
small — one ICI broadcast), and the whole chunk renders as a single SPMD program
with zero communication inside the loop (SURVEY §5.7).

Host-side, rays are processed in fixed-size chunks (the CLI ``-R`` knob,
reference args.py:19): every chunk is padded to the same static shape so XLA
compiles exactly one executable, and the pad is masked off on the way out.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.pixelnerf import EncodedScene, PixelNeRFNet
from ..render.renderer import NeRFRenderer, RenderConfig, render_rays

Array = jnp.ndarray


class RenderPipeline:
    def __init__(
        self,
        net: PixelNeRFNet,
        renderer: NeRFRenderer,
        mesh: Optional[Mesh] = None,
        simple_output: bool = False,
    ):
        self.net = net
        self.renderer = renderer
        self.mesh = mesh
        self.simple_output = simple_output
        self._use_viewdirs = None
        self._jitted: Dict[RenderConfig, Any] = {}

    @property
    def use_viewdirs(self) -> bool:
        if self._use_viewdirs is None:
            self._use_viewdirs = self.net.conf.get_bool("use_viewdirs", False)
        return self._use_viewdirs

    def _get_render_fn(self, cfg: RenderConfig, want_weights: bool):
        key = (cfg, want_weights)
        if key in self._jitted:
            return self._jitted[key]

        net = self.net
        use_viewdirs = self.use_viewdirs

        def fn(variables, scene: EncodedScene, rays: Array, rng: Array):
            def field(points, viewdirs, coarse):
                return net.apply(
                    variables,
                    scene,
                    points,
                    viewdirs=viewdirs if use_viewdirs else None,
                    coarse=coarse,
                    method=PixelNeRFNet.query,
                )

            return render_rays(
                field,
                rays,
                rng,
                cfg,
                want_weights=want_weights,
                training=False,
                use_viewdirs=use_viewdirs,
            )

        if self.mesh is not None and np.prod(self.mesh.devices.shape) > 1:
            ray_axis = self.mesh.axis_names[-1]
            replicated = NamedSharding(self.mesh, P())
            rays_sharding = NamedSharding(self.mesh, P(None, ray_axis, None))
            jitted = jax.jit(
                fn,
                in_shardings=(replicated, replicated, rays_sharding, replicated),
            )
        else:
            jitted = jax.jit(fn)
        self._jitted[key] = jitted
        return jitted

    def render(
        self,
        variables,
        scene: EncodedScene,
        rays: np.ndarray,
        rng: Array,
        ray_batch_size: int = 50000,
        want_weights: bool = False,
    ) -> Dict[str, Any]:
        """Render an arbitrary number of rays for one scene.

        :param rays: (NR, 8) — the flattened view of gen_rays output
        :return: {"coarse": {...}, "fine": {...}} with host numpy arrays (NR, ...)
        """
        cfg = self.renderer.cfg
        fn = self._get_render_fn(cfg, want_weights)

        NR = rays.shape[0]
        n_dev = 1 if self.mesh is None else int(np.prod(self.mesh.devices.shape))
        chunk = min(ray_batch_size, NR)
        chunk = -(-chunk // n_dev) * n_dev  # pad chunk to a multiple of devices

        pieces = []
        for start in range(0, NR, chunk):
            part = rays[start : start + chunk]
            pad = chunk - part.shape[0]
            if pad > 0:
                part = np.concatenate([part, np.tile(part[-1:], (pad, 1))], axis=0)
            rng, step_rng = jax.random.split(rng)
            out = fn(variables, scene, jnp.asarray(part)[None], step_rng)
            pieces.append(jax.tree.map(lambda x: np.asarray(x)[0], out))

        def cat(*xs):
            return np.concatenate(xs, axis=0)[:NR]

        return jax.tree.map(cat, *pieces)

    def render_simple(
        self, variables, scene, rays, rng, ray_batch_size: int = 50000
    ):
        """(rgb, depth) from the fine pass if present, else coarse — the
        reference's simple_output contract (nerf.py:32-39)."""
        out = self.render(variables, scene, rays, rng, ray_batch_size)
        branch = out["fine"] if self.renderer.using_fine else out["coarse"]
        return branch["rgb"], branch["depth"]
