"""Scene compiler: DSL object graph -> flat SoA SceneTables.

The TPU replacement for the reference's device-side world construction
(``create_world_*<<<1,1>>>`` kernels building object graphs with device
``new``, reference src/main.cu:160-635): the scene is built on host, all
instancing transforms are baked (translate/rotate_y chains are affine), and
geometry/materials/textures flatten into integer-tagged tables.
"""

from __future__ import annotations

import dataclasses
import math
import os

import jax.numpy as jnp
import numpy as np

from art_tpu.core.camera import Camera, make_camera
from art_tpu.scene import materials as M
from art_tpu.scene import objects as O
from art_tpu.scene import textures as X
from art_tpu.scene.tables import MatType, SceneTables, TexType, empty_tables
from art_tpu.utils.images import ImageAtlas, asset_path, load_image_rgb


def _rot_y(theta: float, p: np.ndarray) -> np.ndarray:
    c, s = math.cos(theta), math.sin(theta)
    return np.array(
        [c * p[0] + s * p[2], p[1], -s * p[0] + c * p[2]], np.float64
    )


@dataclasses.dataclass
class _Xform:
    """Accumulated affine map: world = R_y(theta) * local + offset."""

    theta: float = 0.0
    offset: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float64)
    )

    def apply_point(self, p) -> np.ndarray:
        return _rot_y(self.theta, np.asarray(p, np.float64)) + self.offset

    def apply_vector(self, v) -> np.ndarray:
        return _rot_y(self.theta, np.asarray(v, np.float64))


@dataclasses.dataclass(frozen=True)
class CompiledScene:
    tables: SceneTables
    camera: Camera
    background: tuple
    gradient_bg: bool
    name: str = "scene"


class SceneBuilder:
    def __init__(self):
        self._objects: list[O.SceneObject] = []
        self._camera: Camera | None = None
        self._background = (0.0, 0.0, 0.0)
        self._gradient_bg = False
        self._name = "scene"

    # ---- construction API ----
    def add(self, *objs: O.SceneObject) -> "SceneBuilder":
        self._objects.extend(objs)
        return self

    def set_camera(self, **kwargs) -> "SceneBuilder":
        self._camera = make_camera(**kwargs)
        return self

    def set_background(self, color=(0, 0, 0), gradient: bool = False) -> "SceneBuilder":
        self._background = tuple(float(c) for c in color)
        self._gradient_bg = bool(gradient)
        return self

    def set_name(self, name: str) -> "SceneBuilder":
        self._name = name
        return self

    # ---- compilation ----
    def compile(self) -> CompiledScene:
        if self._camera is None:
            raise ValueError("scene has no camera; call set_camera(...)")

        comp = _Compiler()
        for obj in self._objects:
            comp.visit(obj, _Xform(), material_override=None)
        tables = comp.finish()
        return CompiledScene(
            tables=tables,
            camera=self._camera,
            background=self._background,
            gradient_bg=self._gradient_bg,
            name=self._name,
        )


def _detect_box_grid(tables: SceneTables) -> SceneTables:
    """Detect a regular-grid box field and attach its (Kx, Kz, 2) table.

    Fires when EVERY box in the scene is an unrotated AABB whose footprint
    sits on one arithmetic (x, z) lattice with a shared cell size and a
    shared floor y0, at most one box per cell — the reference's 20x20
    ground-box field (src/main.cu:509-514).  The grid kernel
    (ops/pallas_kernels.box_grid_hit_attrs) then computes per-column /
    per-row slab crossings incrementally instead of 6 fresh plane tests
    per box, cutting the per-box cost ~2x.  Empty cells get y1 = y0
    (zero-height => strict t0 < t1 never passes)."""
    B = tables.n_boxes
    if B < 64 or tables.has_rotated_boxes:
        return tables
    mn = np.asarray(tables.box_min) + np.asarray(tables.box_off)
    mx = np.asarray(tables.box_max) + np.asarray(tables.box_off)
    y0 = mn[0, 1]
    if not np.all(mn[:, 1] == y0):
        return tables
    wx = mx[:, 0] - mn[:, 0]
    wz = mx[:, 2] - mn[:, 2]
    w = wx[0]
    if w <= 0 or not (np.all(wx == w) and np.all(wz == w)):
        return tables
    gx0, gz0 = mn[:, 0].min(), mn[:, 2].min()
    fx = (mn[:, 0] - gx0) / w
    fz = (mn[:, 2] - gz0) / w
    kxs, kzs = np.rint(fx).astype(np.int64), np.rint(fz).astype(np.int64)
    # Exact lattice fit in the KERNEL's arithmetic: box_grid_hit_attrs
    # reconstructs bounds as f32(x0) + f32(k * w) with f32 roundings at
    # each step, so the check must round the same way (an int64 * f32
    # product here would promote to f64 and pass lattices the kernel
    # reconstructs one ulp off).
    rx = np.float32(gx0) + kxs.astype(np.float32) * np.float32(w)
    rz = np.float32(gz0) + kzs.astype(np.float32) * np.float32(w)
    if not (
        np.all(rx == mn[:, 0].astype(np.float32))
        and np.all(rz == mn[:, 2].astype(np.float32))
    ):
        return tables
    kx, kz = int(kxs.max()) + 1, int(kzs.max()) + 1
    if kx * kz > 4 * B:  # too sparse: padded cells would dominate
        return tables
    cell = kxs * kz + kzs
    if len(np.unique(cell)) != B:  # more than one box in a cell
        return tables
    grid = np.zeros((kx, kz, 2), np.float32)
    grid[:, :, 0] = y0  # empty cells: zero height, inert
    grid[kxs, kzs, 0] = mx[:, 1]
    grid[kxs, kzs, 1] = np.asarray(tables.box_mat, np.float32)
    # Compile-time cell grouping for the fully-static kernel: cells
    # sharing a (height, material) share one y-slab computation.  Gated
    # by unroll size (ops ~ 14 per cell; 1024 cells keeps the kernel body
    # comparable to the 32x-unrolled sphere loop).
    cells = None
    if B <= 1024:
        groups: dict = {}
        for b in range(B):
            key = (float(mx[b, 1]), float(tables.box_mat[b]))
            groups.setdefault(key, []).append((int(kxs[b]), int(kzs[b])))
        cells = tuple(
            sorted(
                (h, m, tuple(sorted(g))) for (h, m), g in groups.items()
            )
        )
    return dataclasses.replace(
        tables,
        box_grid=jnp.asarray(grid),
        box_grid_kx=kx,
        box_grid_kz=kz,
        box_grid_x0=float(gx0),
        box_grid_z0=float(gz0),
        box_grid_w=float(w),
        box_grid_y0=float(y0),
        box_grid_mat=(
            float(tables.box_mat[0])
            if np.all(np.asarray(tables.box_mat) == tables.box_mat[0])
            else -1.0
        ),
        box_grid_cells=cells,
    )


class _Compiler:
    def __init__(self):
        self.spheres: list[tuple] = []  # (c0, vel, radius, mat_id)
        self.quads: list[tuple] = []  # (q, u, v, mat_id, inward)
        self.boxes: list[tuple] = []  # (bmin, bmax, cos, sin, off, mat_id)
        self.media: list[tuple] = []  # (kind, params..., neg_inv_density, mat_id)
        # kind-2 (general) medium boundary primitives, tagged by medium idx
        self.gb_sph: list[tuple] = []  # (med, c0, vel, radius)
        self.gb_quad: list[tuple] = []  # (med, q, u, v)
        self.gb_box: list[tuple] = []  # (med, bmin, bmax, cos, sin, off)
        self._in_boundary = False
        self.mats: list[dict] = []
        self.texs: list[dict] = []
        self.images: list[np.ndarray] = []
        self._mat_ids: dict[int, int] = {}
        self._tex_ids: dict[int, int] = {}
        self._img_ids: dict[int, int] = {}
        # value-dedup maps: identical parameter rows share one table row so
        # the per-ray lookup tables stay small enough for one-hot MXU
        # fetches (e.g. bouncing_spheres builds 488 material instances from
        # ~10 distinct parameter sets)
        self._mat_rows: dict[tuple, int] = {}
        self._tex_rows: dict[tuple, int] = {}
        # The _mat_ids/_tex_ids/_img_ids caches key on id(obj); a temporary
        # object (e.g. the Isotropic phase material built per medium) that
        # gets garbage-collected lets a LATER object reuse the same id and
        # silently inherit the wrong table row.  Pin every keyed object for
        # the compiler's lifetime.
        self._keepalive: list = []

    # -- textures --
    def tex_id(self, tex: X.Texture) -> int:
        key = id(tex)
        if key in self._tex_ids:
            return self._tex_ids[key]
        self._keepalive.append(tex)
        row = dict(
            type=int(TexType.SOLID),
            rgb=(0.0, 0.0, 0.0),
            rgb2=(0.0, 0.0, 0.0),
            params=[0.0] * 8,
            child=(0, 0),
            img=0,
        )

        if isinstance(tex, X.SolidColor):
            row["type"] = int(TexType.SOLID)
            row["rgb"] = tuple(np.asarray(tex.albedo, np.float64))
        elif isinstance(tex, X.Checker):
            row["type"] = int(TexType.CHECKER)
            row["params"][0] = 1.0 / tex.scale  # inv_scale (src/texture.cuh:33)
            row["child"] = (self.tex_id(tex.even), self.tex_id(tex.odd))
        elif isinstance(tex, X.ImageTexture):
            row["type"] = int(TexType.IMAGE)
            row["img"] = self.img_id(tex.image)
        elif isinstance(tex, X.NoiseTexture):
            row["type"] = int(TexType.NOISE)
            row["params"][0] = float(tex.scale)
        elif isinstance(tex, X.NoodleTexture):
            row["type"] = int(TexType.NOODLE)
            d = np.asarray(tex.direction, np.float64)
            d = d / np.linalg.norm(d)
            row["params"][:7] = [
                float(tex.stripes_k),
                float(tex.wiggle_amp),
                float(tex.wiggle_freq),
                float(tex.octaves),
                *d.tolist(),
            ]
            row["rgb"] = tuple(np.asarray(tex.noodle, np.float64))
            row["rgb2"] = tuple(np.asarray(tex.gap, np.float64))
        elif isinstance(tex, X.FeltTexture):
            row["type"] = int(TexType.FELT)
            row["rgb"] = tuple(np.asarray(tex.base, np.float64))
            row["params"][:4] = [
                float(tex.mottling_scale),
                float(tex.mottling_amt),
                float(tex.fiber_scale),
                float(tex.fiber_amt),
            ]
        elif isinstance(tex, X.UVOffset):
            row["type"] = int(TexType.UV_OFFSET)
            row["params"][0] = float(tex.u_offset_turns)
            row["params"][1] = float(tex.v_offset)
            row["child"] = (self.tex_id(tex.base), 0)
        else:
            raise TypeError(f"unknown texture type: {type(tex)!r}")

        content = (
            row["type"], row["rgb"], row["rgb2"], tuple(row["params"]),
            row["child"], row["img"],
        )
        if content in self._tex_rows:
            idx = self._tex_rows[content]
        else:
            idx = len(self.texs)
            self.texs.append(row)
            self._tex_rows[content] = idx
        self._tex_ids[key] = idx
        return idx

    def img_id(self, image) -> int:
        if isinstance(image, str):
            name = image
            if name in self._img_ids:
                return self._img_ids[name]
            idx = len(self.images)
            self.images.append(load_image_rgb(asset_path(name)))
            self._img_ids[name] = idx
            return idx
        key = id(image)
        if key in self._img_ids:
            return self._img_ids[key]
        self._keepalive.append(image)
        idx = len(self.images)
        self.images.append(np.asarray(image, np.uint8))
        self._img_ids[key] = idx
        return idx

    # -- materials --
    def mat_id(self, mat: M.Material) -> int:
        key = id(mat)
        if key in self._mat_ids:
            return self._mat_ids[key]
        self._keepalive.append(mat)
        row = dict(type=0, tex=0, rgb=(0.0, 0.0, 0.0), fuzz=0.0, ref_idx=1.0)
        if isinstance(mat, M.Lambertian):
            row["type"] = int(MatType.LAMBERTIAN)
            row["tex"] = self.tex_id(mat.texture)
        elif isinstance(mat, M.Metal):
            row["type"] = int(MatType.METAL)
            row["rgb"] = tuple(np.asarray(mat.albedo, np.float64))
            row["fuzz"] = min(float(mat.fuzz), 1.0)  # src/material.cuh:97
        elif isinstance(mat, M.Dielectric):
            row["type"] = int(MatType.DIELECTRIC)
            row["ref_idx"] = float(mat.ref_idx)
        elif isinstance(mat, M.DiffuseLight):
            row["type"] = int(MatType.DIFFUSE_LIGHT)
            row["tex"] = self.tex_id(mat.texture)
        elif isinstance(mat, M.Isotropic):
            row["type"] = int(MatType.ISOTROPIC)
            row["tex"] = self.tex_id(mat.texture)
        else:
            raise TypeError(f"unknown material type: {type(mat)!r}")

        content = (row["type"], row["tex"], row["rgb"], row["fuzz"], row["ref_idx"])
        if content in self._mat_rows:
            idx = self._mat_rows[content]
        else:
            idx = len(self.mats)
            self.mats.append(row)
            self._mat_rows[content] = idx
        self._mat_ids[key] = idx
        return idx

    # -- objects --
    def _prim_mat(self, mat) -> int:
        """Material id for a primitive; boundary geometry is never shaded
        (the medium's phase function provides the material,
        src/constant_medium.cuh:24-28), so skip interning — a unique
        boundary material would otherwise widen mat/tex tables with dead
        rows, and a material-less boundary primitive would raise."""
        if self._in_boundary:
            return 0
        return self.mat_id(mat)

    def visit(self, obj: O.SceneObject, xf: _Xform, material_override):
        if isinstance(obj, O.Translate):
            off = xf.offset + xf.apply_vector(obj.offset)
            self.visit(obj.obj, _Xform(xf.theta, off), material_override)
        elif isinstance(obj, O.RotateY):
            theta = xf.theta + math.radians(obj.degrees)
            self.visit(obj.obj, _Xform(theta, xf.offset), material_override)
        elif isinstance(obj, O.WithMaterial):
            # Outermost override wins: the reference's with_material
            # (src/hittable.cuh:154-178) rewrites rec.mat_ptr AFTER the
            # inner hit returns, so an outer wrapper's material replaces
            # whatever an inner with_material set.
            self.visit(
                obj.obj, xf,
                material_override if material_override is not None
                else obj.material,
            )
        elif isinstance(obj, O.Sphere):
            mat = material_override or obj.material
            c0 = xf.apply_point(obj.center)
            if obj.center2 is not None:
                c1 = xf.apply_point(obj.center2)
                vel = c1 - c0
            else:
                vel = np.zeros(3)
            self.spheres.append((c0, vel, float(obj.radius), self._prim_mat(mat)))
        elif isinstance(obj, O.Quad):
            mat = material_override or obj.material
            q = xf.apply_point(obj.q)
            u = xf.apply_vector(obj.u)
            v = xf.apply_vector(obj.v)
            self.quads.append((q, u, v, self._prim_mat(mat), bool(obj.inward)))
        elif isinstance(obj, O.Box):
            mat = material_override or obj.material
            a = np.asarray(obj.a, np.float64)
            b = np.asarray(obj.b, np.float64)
            bmin = np.minimum(a, b)
            bmax = np.maximum(a, b)
            self.boxes.append(
                (bmin, bmax, math.cos(xf.theta), math.sin(xf.theta),
                 xf.offset.copy(), self._prim_mat(mat))
            )
        elif isinstance(obj, O.Group):
            for child in obj.children:
                self.visit(child, xf, material_override)
        elif isinstance(obj, O.ConstantMedium):
            if self._in_boundary:
                raise TypeError(
                    "a ConstantMedium boundary cannot contain another "
                    "ConstantMedium (the reference's boundary->hit chain "
                    "has no such nesting either, src/constant_medium.cuh:38-44)"
                )
            self._visit_medium(obj, xf)
        else:
            raise TypeError(f"unknown scene object: {type(obj)!r}")

    def _visit_medium(self, med: O.ConstantMedium, xf: _Xform):
        # Resolve the boundary subtree to a single transformed Sphere or Box.
        node = med.boundary
        inner = _Xform(xf.theta, xf.offset.copy())
        while isinstance(node, (O.Translate, O.RotateY, O.WithMaterial)):
            if isinstance(node, O.Translate):
                inner = _Xform(
                    inner.theta, inner.offset + inner.apply_vector(node.offset)
                )
                node = node.obj
            elif isinstance(node, O.RotateY):
                inner = _Xform(inner.theta + math.radians(node.degrees), inner.offset)
                node = node.obj
            else:
                node = node.obj  # material override is irrelevant to a boundary

        phase_mat = M.Isotropic(med.texture)
        mat_id = self.mat_id(phase_mat)
        nid = -1.0 / med.density  # src/constant_medium.cuh:25

        if isinstance(node, O.Sphere) and node.center2 is None:
            # Analytic static-sphere fast path.  A MOVING sphere boundary
            # must go through the general (kind-2) tables below — they carry
            # per-ray time and the velocity row; this branch would freeze
            # the medium at the t=0 center.
            c = inner.apply_point(node.center)
            self.media.append(
                dict(kind=0, center=c, radius=abs(float(node.radius)),
                     bmin=np.zeros(3), bmax=np.ones(3), cos=1.0, sin=0.0,
                     off=np.zeros(3), nid=nid, mat=mat_id)
            )
        elif isinstance(node, O.Box):
            a = np.asarray(node.a, np.float64)
            b = np.asarray(node.b, np.float64)
            self.media.append(
                dict(kind=1, center=np.zeros(3), radius=1.0,
                     bmin=np.minimum(a, b), bmax=np.maximum(a, b),
                     cos=math.cos(inner.theta), sin=math.sin(inner.theta),
                     off=inner.offset.copy(), nid=nid, mat=mat_id)
            )
        else:
            # General boundary (reference src/constant_medium.cuh:16-34
            # accepts any hittable): compile the subtree's primitives into
            # the per-medium gb tables; apply_media_p runs the reference's
            # first-hit/second-hit traversal over them brute-force.
            med_idx = len(self.media)
            saved = (self.spheres, self.quads, self.boxes)
            self.spheres, self.quads, self.boxes = [], [], []
            self._in_boundary = True
            try:
                self.visit(med.boundary, xf, None)
                bnd_sph, bnd_quad, bnd_box = self.spheres, self.quads, self.boxes
            finally:
                self.spheres, self.quads, self.boxes = saved
                self._in_boundary = False
            if not (bnd_sph or bnd_quad or bnd_box):
                raise TypeError(
                    "ConstantMedium boundary contains no geometry "
                    f"({type(med.boundary).__name__})"
                )
            for c0, vel, radius, _m in bnd_sph:
                self.gb_sph.append((med_idx, c0, vel, radius))
            for q, u, v, _m, _inward in bnd_quad:
                self.gb_quad.append((med_idx, q, u, v))
            for bmin, bmax, cos_t, sin_t, off, _m in bnd_box:
                self.gb_box.append((med_idx, bmin, bmax, cos_t, sin_t, off))
            self.media.append(
                dict(kind=2, center=np.zeros(3), radius=1.0,
                     bmin=np.zeros(3), bmax=np.ones(3), cos=1.0, sin=0.0,
                     off=np.zeros(3), nid=nid, mat=mat_id)
            )

    # -- table assembly --
    def finish(self) -> SceneTables:
        t = empty_tables()
        f32 = np.float32

        if not self.mats:
            # Scenes must have at least one material row for gathers.
            self.mat_id(M.Lambertian((0.5, 0.5, 0.5)))

        if self.spheres:
            c0 = np.stack([s[0] for s in self.spheres]).astype(f32)
            vel = np.stack([s[1] for s in self.spheres]).astype(f32)
            t.update(
                sph_center=jnp.asarray(c0),
                sph_vel=jnp.asarray(vel),
                sph_radius=jnp.asarray([s[2] for s in self.spheres], f32),
                sph_mat=jnp.asarray([s[3] for s in self.spheres], np.int32),
                n_spheres=len(self.spheres),
                has_moving=bool(np.any(vel != 0.0)),
            )

        if self.quads:
            qs = np.stack([q[0] for q in self.quads]).astype(np.float64)
            us = np.stack([q[1] for q in self.quads]).astype(np.float64)
            vs = np.stack([q[2] for q in self.quads]).astype(np.float64)
            inward = np.asarray([q[4] for q in self.quads])
            n = np.cross(us, vs)
            nn = np.sum(n * n, axis=-1, keepdims=True)
            normal = n / np.sqrt(nn)
            normal = np.where(inward[:, None], -normal, normal)  # src/quad.cuh:35
            d = np.sum(normal * qs, axis=-1)
            w = n / nn  # src/quad.cuh:38
            avec = np.cross(vs, w)  # alpha = dot(avec, p) - dot(avec, q)
            bvec = np.cross(w, us)
            t.update(
                quad_q=jnp.asarray(qs, f32),
                quad_u=jnp.asarray(us, f32),
                quad_v=jnp.asarray(vs, f32),
                quad_w=jnp.asarray(w, f32),
                quad_n=jnp.asarray(normal, f32),
                quad_d=jnp.asarray(d, f32),
                quad_mat=jnp.asarray([q[3] for q in self.quads], np.int32),
                quad_avec=jnp.asarray(avec, f32),
                quad_bvec=jnp.asarray(bvec, f32),
                quad_ca=jnp.asarray(np.sum(avec * qs, axis=-1), f32),
                quad_cb=jnp.asarray(np.sum(bvec * qs, axis=-1), f32),
                n_quads=len(self.quads),
            )

        if self.boxes:
            sins = np.asarray([b[3] for b in self.boxes], f32)
            coss = np.asarray([b[2] for b in self.boxes], f32)
            t.update(
                box_min=jnp.asarray(np.stack([b[0] for b in self.boxes]), f32),
                box_max=jnp.asarray(np.stack([b[1] for b in self.boxes]), f32),
                box_cos=jnp.asarray(coss),
                box_sin=jnp.asarray(sins),
                box_off=jnp.asarray(np.stack([b[4] for b in self.boxes]), f32),
                box_mat=jnp.asarray([b[5] for b in self.boxes], np.int32),
                n_boxes=len(self.boxes),
                # a 180-degree rotation has sin == 0 but cos == -1, so the
                # gate must consider both components
                has_rotated_boxes=bool(np.any((sins != 0.0) | (coss != 1.0))),
            )

        if self.media:
            t.update(
                med_kind=jnp.asarray([m["kind"] for m in self.media], np.int32),
                med_center=jnp.asarray(np.stack([m["center"] for m in self.media]), f32),
                med_radius=jnp.asarray([m["radius"] for m in self.media], f32),
                med_min=jnp.asarray(np.stack([m["bmin"] for m in self.media]), f32),
                med_max=jnp.asarray(np.stack([m["bmax"] for m in self.media]), f32),
                med_cos=jnp.asarray([m["cos"] for m in self.media], f32),
                med_sin=jnp.asarray([m["sin"] for m in self.media], f32),
                med_off=jnp.asarray(np.stack([m["off"] for m in self.media]), f32),
                med_neg_inv_density=jnp.asarray([m["nid"] for m in self.media], f32),
                med_mat=jnp.asarray([m["mat"] for m in self.media], np.int32),
                n_media=len(self.media),
                med_kinds=tuple(int(m["kind"]) for m in self.media),
            )

        if self.gb_sph:
            t.update(
                gb_sph=jnp.asarray(
                    [[*g[1], *g[2], g[3]] for g in self.gb_sph], f32
                ),
                gb_sph_meds=tuple(int(g[0]) for g in self.gb_sph),
            )
        if self.gb_quad:
            rows = []
            for _m, q, u, v in self.gb_quad:
                q = np.asarray(q, np.float64)
                u = np.asarray(u, np.float64)
                v = np.asarray(v, np.float64)
                n = np.cross(u, v)
                nn = float(np.dot(n, n))
                normal = n / math.sqrt(nn)
                rows.append([*q, *u, *v, *(n / nn), *normal,
                             float(np.dot(normal, q))])
            t.update(
                gb_quad=jnp.asarray(rows, f32),
                gb_quad_meds=tuple(int(g[0]) for g in self.gb_quad),
            )
        if self.gb_box:
            t.update(
                gb_box=jnp.asarray(
                    [[*g[1], *g[2], g[3], g[4], *g[5]] for g in self.gb_box],
                    f32,
                ),
                gb_box_meds=tuple(int(g[0]) for g in self.gb_box),
            )

        t.update(
            mat_type=jnp.asarray([m["type"] for m in self.mats], np.int32),
            mat_tex=jnp.asarray([m["tex"] for m in self.mats], np.int32),
            mat_rgb=jnp.asarray([m["rgb"] for m in self.mats], f32),
            mat_fuzz=jnp.asarray([m["fuzz"] for m in self.mats], f32),
            mat_ref_idx=jnp.asarray([m["ref_idx"] for m in self.mats], f32),
        )
        if self.texs:
            t.update(
                tex_type=jnp.asarray([x["type"] for x in self.texs], np.int32),
                tex_rgb=jnp.asarray([x["rgb"] for x in self.texs], f32),
                tex_rgb2=jnp.asarray([x["rgb2"] for x in self.texs], f32),
                tex_params=jnp.asarray([x["params"] for x in self.texs], f32),
                tex_child=jnp.asarray([x["child"] for x in self.texs], np.int32),
                tex_img=jnp.asarray([x["img"] for x in self.texs], np.int32),
                tex_types_present=tuple(sorted({x["type"] for x in self.texs})),
            )
        if self.images:
            t.update(atlas=ImageAtlas.pack(self.images))

        # Row-packed lookup tables (single fetch per bounce, ops/gather.py).
        mat_packed = np.zeros((len(self.mats), 8), f32)
        for i, m in enumerate(self.mats):
            mat_packed[i] = [
                m["type"], m["tex"], m["fuzz"], m["ref_idx"], *m["rgb"], 0.0
            ]
        t["mat_packed"] = jnp.asarray(mat_packed)

        if self.texs:
            tex_packed = np.zeros((len(self.texs), 18), f32)
            for i, x in enumerate(self.texs):
                tex_packed[i] = [
                    x["type"], *x["params"], *x["child"], x["img"],
                    *x["rgb"], *x["rgb2"],
                ]
            t["tex_packed"] = jnp.asarray(tex_packed)

        if self.quads:
            qa = np.zeros((len(self.quads), 16), np.float64)
            for i, (q, u, v, mid, _inward) in enumerate(self.quads):
                # w and normal recomputed the same way as the main table
                n = np.cross(u, v)
                nn = float(np.dot(n, n))
                normal = n / np.sqrt(nn)
                if _inward:
                    normal = -normal
                qa[i] = [*q, *u, *v, *(n / nn), *normal, mid]
            t["quad_attr_packed"] = jnp.asarray(qa, f32)

        tables = SceneTables(**t)
        # Kernel-packed copies for the Pallas intersection path.
        from art_tpu.ops.pallas_kernels import (
            cluster_boxes,
            cluster_spheres,
            pack_boxes,
            pack_quads,
            pack_spheres,
        )

        (sph_packed, sph_n_moving_pad, sph_n_static,
         (sph_n_tail, sph_tail_r, sph_tail_mat, sph_pos_r)) = pack_spheres(
            tables
        )
        # Expanded-quadratic gate (ops/pallas_kernels._sphere_kernel): the
        # expansion c' = |o|^2 - 2 o.c + (|c|^2 - r^2) cancels its large
        # terms when the ray origin sits ON the sphere (every scattered
        # ray), with absolute error ~ (|c|^2+1)*6*2^-23 (origins near
        # sphere s satisfy |o| ~ |c_s|).  Safe when that error is < 1% of
        # r^2 for every static sphere.
        if sph_n_static:
            pk_np = np.asarray(sph_packed)
            stat = pk_np[sph_n_moving_pad : sph_n_moving_pad + sph_n_static]
            cc = np.sum(stat[:, 0:3].astype(np.float64) ** 2, axis=1)
            r2 = stat[:, 8].astype(np.float64)
            sph_expand = bool(np.all((cc + 1.0) * 6.0 * 2.0**-23 < 0.01 * r2))
        else:
            sph_expand = False
        # Compile-time constant rows for the fully-static sphere kernel
        # (opt-in, ART_TPU_SPH_STATIC).  Gated by unroll size: ~30 vector
        # ops per baked sphere keeps a 2048-sphere body within Mosaic's
        # practical compile budget (final_scene's 1008 is the largest
        # reference scene).
        sph_static_cells = None
        if tables.n_spheres and tables.n_spheres <= 2048:
            from art_tpu.ops.pallas_kernels import static_sphere_cells

            sph_static_cells = static_sphere_cells(
                sph_packed, sph_n_moving_pad, sph_n_static, sph_n_tail
            )
        from art_tpu.ops.pallas_kernels import pack_tail_spheres

        sph_tail_packed, sph_tail_box = pack_tail_spheres(
            sph_packed, sph_n_moving_pad, sph_n_static, sph_n_tail
        )
        # Needy-skip binned kernel table (pallas_kernels._sphere_skip_kernel):
        # gate on the same tail-cluster class as the compacted pass.  Bin
        # axis: world y when the cluster has real y extent — the wavefront
        # pool is approximately pixel-sorted, so a ray block is a contiguous
        # image span whose y footprint through the cluster is narrow for any
        # y-up camera (every reference camera); falls back to the largest
        # extent for y-degenerate clusters.
        sph_skip_packed = jnp.zeros((1, 10), jnp.float32)
        sph_skip_bins = None
        from art_tpu.ops.pallas_kernels import SKIP_MIN_TAIL, _SPH_BINS

        if sph_n_tail >= SKIP_MIN_TAIL and sph_tail_box:
            from art_tpu.ops.pallas_kernels import pack_skip_spheres

            ext = [
                sph_tail_box[3] - sph_tail_box[0],
                sph_tail_box[4] - sph_tail_box[1],
                sph_tail_box[5] - sph_tail_box[2],
            ]
            axis = 1 if ext[1] >= 0.25 * max(ext) else int(np.argmax(ext))
            nbins = max(1, min(_SPH_BINS, sph_n_tail // 32))
            sph_skip_packed, sph_skip_bins = pack_skip_spheres(
                sph_packed, sph_n_moving_pad, sph_n_static, sph_n_tail,
                axis, nbins,
            )
        # Cell-binned kernel table (pallas_kernels._sphere_cellbin_kernel):
        # every small sphere (moving included) in a 2-D lattice cell, for
        # many-small-spheres scenes with NO uniform tail (bouncing's 22x22
        # grid of per-material movers).  pack returns meta=None below its
        # own binnable-count gate.
        sph_cellbin_packed = jnp.zeros((1, 10), jnp.float32)
        sph_cellbin_meta = None
        from art_tpu.ops.pallas_kernels import CELLBIN_MIN

        if sph_n_tail >= SKIP_MIN_TAIL and sph_tail_box:
            # Tail-cluster scenes: 2-D (y x horizontal) lattice over the
            # tail only — rear cells prune via the kernel's occlusion
            # bound where 1-D y-bins cannot (pack_tail2d_spheres).
            from art_tpu.ops.pallas_kernels import pack_tail2d_spheres

            sph_cellbin_packed, sph_cellbin_meta = pack_tail2d_spheres(
                sph_packed, sph_n_moving_pad, sph_n_static, sph_n_tail
            )
        elif tables.n_spheres >= CELLBIN_MIN:
            from art_tpu.ops.pallas_kernels import pack_cellbin_spheres

            sph_cellbin_packed, sph_cellbin_meta = pack_cellbin_spheres(
                sph_packed, sph_n_moving_pad, sph_n_static
            )
        # Recentered tail MXU tables (ART_TPU_MXU_TAIL experiment):
        # subtracting the tail centroid bounds the bilinear features by
        # the cluster SPAN, not its absolute position, keeping the
        # expanded-quadratic selection error ~|c|^2*2^-23 below t_min.
        sph_mxu_tail_feat = jnp.zeros((2, 16), jnp.float32)
        sph_mxu_tail_attr = jnp.zeros((8, 1), jnp.float32)
        mxu_tail_pad = 0
        sph_tail_centroid = ()
        if sph_n_tail >= SKIP_MIN_TAIL and sph_tail_box:
            from art_tpu.ops.pallas_kernels import sphere_mxu_features

            tp = np.asarray(sph_tail_packed).copy()
            G = tp[:sph_n_tail, 0:3].mean(axis=0)
            tp[:sph_n_tail, 0:3] -= G
            F_t, attrT_t, pad_t = sphere_mxu_features(tp, sph_n_tail)
            sph_mxu_tail_feat, sph_mxu_tail_attr = F_t, attrT_t
            mxu_tail_pad = pad_t
            sph_tail_centroid = tuple(float(v) for v in G)
        tables = dataclasses.replace(
            tables,
            sph_packed=sph_packed,
            sph_tail_packed=sph_tail_packed,
            sph_tail_box=sph_tail_box,
            sph_mxu_tail_feat=sph_mxu_tail_feat,
            sph_mxu_tail_attr=sph_mxu_tail_attr,
            mxu_tail_pad=mxu_tail_pad,
            sph_tail_centroid=sph_tail_centroid,
            sph_skip_packed=sph_skip_packed,
            sph_skip_bins=sph_skip_bins,
            sph_cellbin_packed=sph_cellbin_packed,
            sph_cellbin_meta=sph_cellbin_meta,
            sph_n_moving_pad=sph_n_moving_pad,
            sph_n_static=sph_n_static,
            sph_n_tail=sph_n_tail,
            sph_tail_r=sph_tail_r,
            sph_tail_mat=sph_tail_mat,
            sph_pos_r=sph_pos_r,
            sph_expand=sph_expand,
            sph_static_cells=sph_static_cells,
            quad_packed=pack_quads(tables),
            box_packed=pack_boxes(tables),
        )
        if tables.n_spheres:
            from art_tpu.ops.pallas_kernels import (
                _sphere_rows,
                sphere_mxu_features,
            )

            # Gate the expanded-quadratic MXU path by coordinate scale: its
            # c' error is ~2^-23 * |o||c| (the |c0|^2 - r^2 feature itself is
            # precomputed exactly) and must stay below t_min-scale so
            # candidate acceptance (self-hit avoidance, t1/t2 root choice)
            # matches the direct form; the winner t is Newton-refined
            # in-kernel and the kernel uses a 2*t_min acceptance margin.
            # Ray origins live on scene surfaces, whose extent is set by the
            # SECOND-largest sphere reach: the classic huge ground sphere
            # (|c| ~ r ~ 1000) only exposes its near-origin cap, and its
            # r >> err makes it insensitive anyway.
            reach = (
                np.abs(np.asarray(tables.sph_center)).max(axis=1)
                + np.abs(np.asarray(tables.sph_vel)).max(axis=1)
                + np.abs(np.asarray(tables.sph_radius))
            )
            reach = np.sort(reach)
            second = float(reach[-2]) if len(reach) > 1 else float(reach[-1])
            # ART_TPU_MXU_FORCE=1 bypasses the precision gate (perf
            # experiments only — images will show acne at large scales).
            if (second <= 64.0 and float(reach[-1]) <= 4096.0) or os.environ.get(
                "ART_TPU_MXU_FORCE"
            ):
                F, attrT, s_pad = sphere_mxu_features(
                    _sphere_rows(tables), tables.n_spheres
                )
                tables = dataclasses.replace(
                    tables, sph_mxu_feat=F, sph_mxu_attr=attrT,
                    mxu_sphere_pad=s_pad,
                )
        tables = _detect_box_grid(tables)
        # Cluster-culling copies (only worthwhile past a handful of
        # primitives; below that the brute kernels win).
        if tables.n_spheres >= 32:
            scl, sbox, n_scl = cluster_spheres(tables)
            tables = dataclasses.replace(
                tables, sph_cl_packed=scl, sph_cl_box=sbox,
                n_sphere_clusters=n_scl,
            )
        if tables.n_boxes >= 32:
            bcl, bbox, n_bcl = cluster_boxes(tables)
            tables = dataclasses.replace(
                tables, box_cl_packed=bcl, box_cl_box=bbox,
                n_box_clusters=n_bcl,
            )
        if tables.n_spheres >= 2:
            # Flattened escape-link sphere BVH for the opt-in per-ray
            # descent path (ART_TPU_BVH=1) — same split rule as the
            # reference's device build (src/bvh.cuh:29-84).
            from art_tpu.ops.bvh import (
                build_bvh,
                pack_bvh,
                sphere_world_bounds,
            )

            bmin, bmax = sphere_world_bounds(
                np.asarray(tables.sph_center),
                np.asarray(tables.sph_vel) if tables.has_moving
                else np.zeros_like(np.asarray(tables.sph_center)),
                np.asarray(tables.sph_radius),
            )
            tree = build_bvh(bmin, bmax)
            tables = dataclasses.replace(
                tables,
                sph_bvh=jnp.asarray(pack_bvh(tree)),
                n_sph_bvh_nodes=tree.n_nodes,
            )
        tables = dataclasses.replace(tables, sp_consts=self._sp_consts(tables))
        tables = dataclasses.replace(
            tables, shade_consts=self._shade_consts()
        )
        return tables

    def _shade_consts(self):
        """Baked material/texture constants for the generic fused shade
        kernel (ops/shade_kernel.py consts mode).

        Unlike sp_consts (whole-scene megakernel, tiny static scenes
        only) this gates on the MATERIAL table alone: <= 24 materials,
        each with a texture resolvable at compile time to solid,
        checker-of-solids, or one special leaf (image / noise / noodle /
        felt, optionally under a uv_offset wrapper whose offsets fold
        into the outside fetch).  The kernel then derives mtype / fuzz /
        ref_idx / metal albedo / texture value from immediates keyed by
        the material-id plane — dropping the per-iteration one-hot
        mat/tex row fetches and wrapper-resolution refetches
        (ops/gather.take_rows + ops/texture_eval phase 1) from the
        staged path.  bouncing_spheres' ~490 distinct albedos fail the
        count gate and keep the plane-fed path.

        Returns (mats, specials) or None; mats[i] =
        (mtype, fuzz, ref_idx, metal_rgb3, tex_kind, tex_data) with
        tex_kind 0 solid (rgb3), 1 checker (inv_scale, even3, odd3),
        2 special; specials[j] = (mat_id, kind, params...) consumed by
        ops/texture_eval.eval_special_p."""
        if not self.mats or len(self.mats) > 24:
            return None

        def f32(v):
            return float(np.float32(v))

        mats, specials = [], []
        for mid, m in enumerate(self.mats):
            ty = int(m["type"])
            tex_kind, tex_data = 0, (0.0, 0.0, 0.0)
            if ty in (0, 3, 4):  # texture-backed: lambertian/light/iso
                tx = self.texs[int(m["tex"])]
                du = dv = 0.0
                if tx["type"] == int(TexType.UV_OFFSET):
                    du, dv = f32(tx["params"][0]), f32(tx["params"][1])
                    tx = self.texs[int(tx["child"][0])]
                    if tx["type"] != int(TexType.IMAGE):
                        return None  # uv wrapper over non-image: no scene
                t = int(tx["type"])
                if t == int(TexType.SOLID):
                    tex_data = tuple(f32(v) for v in tx["rgb"])
                elif t == int(TexType.CHECKER):
                    even = self.texs[int(tx["child"][0])]
                    odd = self.texs[int(tx["child"][1])]
                    if (even["type"] != int(TexType.SOLID)
                            or odd["type"] != int(TexType.SOLID)):
                        return None
                    tex_kind = 1
                    tex_data = (
                        f32(tx["params"][0]),
                        tuple(f32(v) for v in even["rgb"]),
                        tuple(f32(v) for v in odd["rgb"]),
                    )
                elif t == int(TexType.IMAGE):
                    tex_kind = 2
                    specials.append((mid, "image", int(tx["img"]), du, dv))
                elif t == int(TexType.NOISE):
                    tex_kind = 2
                    specials.append((mid, "noise", f32(tx["params"][0])))
                elif t == int(TexType.NOODLE):
                    p = tx["params"]
                    tex_kind = 2
                    specials.append((
                        mid, "noodle", f32(p[0]), f32(p[1]), f32(p[2]),
                        int(p[3]), f32(p[4]), f32(p[5]), f32(p[6]),
                        tuple(f32(v) for v in tx["rgb"]),
                        tuple(f32(v) for v in tx["rgb2"]),
                    ))
                elif t == int(TexType.FELT):
                    p = tx["params"]
                    tex_kind = 2
                    specials.append((
                        mid, "felt", f32(p[0]), f32(p[1]), f32(p[2]),
                        f32(p[3]), tuple(f32(v) for v in tx["rgb"]),
                    ))
                else:
                    return None
            mats.append((
                ty, f32(m["fuzz"]), f32(m["ref_idx"]),
                tuple(f32(v) for v in m["rgb"]), tex_kind, tex_data,
            ))
        return (tuple(mats), tuple(specials))

    def _sp_consts(self, tables):
        """Short-path megakernel gate + baked constants (ops/sp_kernel.py).

        Qualifies small fully-static scenes — no boxes/media/moving
        spheres, <= 16 primitives, materials in {lambertian, metal,
        dielectric, diffuse_light}, textures solid, checker-of-solids or
        perlin-marble noise (the turbulence hash chain is gather-free and
        inlines into the kernel, ops/perlin_kernel.py) — and bakes every
        primitive/material parameter as f32-rounded python floats so the
        fused kernel sees the SAME values the table-driven kernels read
        from their f32 tables."""
        if self.boxes or self.media:
            return None
        if not (0 < len(self.spheres) + len(self.quads) <= 16):
            return None
        if self.spheres and tables.has_moving:
            return None

        def f32(v):
            return float(np.float32(v))

        mats = []
        for m in self.mats:
            ty = int(m["type"])
            if ty not in (0, 1, 2, 3):
                return None
            tex_kind, s_rgb, isc, o_rgb = 0, (0.0,) * 3, 0.0, (0.0,) * 3
            if ty in (0, 3):  # texture-backed: lambertian / diffuse_light
                tx = self.texs[int(m["tex"])]
                if tx["type"] == int(TexType.SOLID):
                    s_rgb = tuple(f32(v) for v in tx["rgb"])
                elif tx["type"] == int(TexType.CHECKER):
                    even = self.texs[tx["child"][0]]
                    odd = self.texs[tx["child"][1]]
                    if (even["type"] != int(TexType.SOLID)
                            or odd["type"] != int(TexType.SOLID)):
                        return None
                    tex_kind = 1
                    isc = f32(tx["params"][0])
                    s_rgb = tuple(f32(v) for v in even["rgb"])
                    o_rgb = tuple(f32(v) for v in odd["rgb"])
                elif tx["type"] == int(TexType.NOISE):
                    # marble: 0.5*(1+sin(scale*z + 10*turb(p,7)))
                    # (src/texture.cuh:62-76); scale rides the isc slot
                    tex_kind = 2
                    isc = f32(tx["params"][0])
                else:
                    return None
            mats.append((
                ty, f32(m["fuzz"]), f32(m["ref_idx"]),
                *(f32(v) for v in m["rgb"]),
                tex_kind, *s_rgb, isc, *o_rgb,
            ))

        spheres = ()
        if self.spheres:
            c = np.asarray(tables.sph_center, np.float32)
            r = np.asarray(tables.sph_radius, np.float32)
            mi = np.asarray(tables.sph_mat)
            spheres = tuple(
                (float(c[i, 0]), float(c[i, 1]), float(c[i, 2]),
                 float(r[i]), int(mi[i]))
                for i in range(len(self.spheres))
            )
        quads = ()
        if self.quads:
            qn = np.asarray(tables.quad_n, np.float32)
            qd = np.asarray(tables.quad_d, np.float32)
            qa = np.asarray(tables.quad_avec, np.float32)
            ca = np.asarray(tables.quad_ca, np.float32)
            qb = np.asarray(tables.quad_bvec, np.float32)
            cb = np.asarray(tables.quad_cb, np.float32)
            qm = np.asarray(tables.quad_mat)
            quads = tuple(
                (*map(float, qn[i]), float(qd[i]),
                 *map(float, qa[i]), float(ca[i]),
                 *map(float, qb[i]), float(cb[i]), int(qm[i]))
                for i in range(len(self.quads))
            )
        return (spheres, quads, tuple(mats))
