"""Device-side compiled scene: flat SoA tables as a JAX pytree.

The reference represents a scene as a tree of `Hittable` interface values
with virtual dispatch (hittable/hittable.go:60-65). On TPU, dynamic dispatch
and pointer-chasing are the enemy: the scene compiler (scene/builder.py)
flattens everything into fixed-shape struct-of-arrays tables, with transforms
baked into primitive coordinates (reference hittable/transformation.go
becomes a build-time bake) and boxes expanded into their six quads
(hittable/objects.go:208-240). Intersection then runs as dense batched math
over these tables (ops/intersect.py).

Every table is padded to at least one row with `active=False` so shapes are
static and non-empty under jit.
"""

from __future__ import annotations

import flax.struct as struct
import jax.numpy as jnp

# Material kinds (hittable/materials.go:11-177)
MAT_LAMBERTIAN = 0
MAT_METAL = 1
MAT_DIELECTRIC = 2
MAT_DIFFUSE_LIGHT = 3
MAT_ISOTROPIC = 4

# Texture kinds (hittable/texture.go:14-125)
TEX_SOLID = 0
TEX_CHECKER = 1
TEX_IMAGE = 2
TEX_PERLIN = 3
TEX_MARBLE = 4
TEX_TURBULENT = 5

# Light kinds for the light-importance-sampling tables (hittable/pdf.go:42-56)
LIGHT_QUAD = 0
LIGHT_SPHERE = 1
LIGHT_TRIANGLE = 2

# Participating-medium boundary kinds (hittable/medium.go:13-62). The
# reference wraps arbitrary Hittables; every use in the codebase is a sphere
# or a (possibly rotated+translated) box, which we handle analytically.
MEDIUM_SPHERE = 0
MEDIUM_BOX = 1


@struct.dataclass
class Spheres:
    """Sphere table (hittable/objects.go:14-115). Motion blur is encoded as
    center(t) = center0 + t * center_delta (objects.go:30-37)."""

    center0: jnp.ndarray      # (S, 3)
    center_delta: jnp.ndarray  # (S, 3)
    radius: jnp.ndarray        # (S,)
    mat_id: jnp.ndarray        # (S,) int32
    active: jnp.ndarray        # (S,) bool

    @property
    def count(self) -> int:
        return self.radius.shape[0]


@struct.dataclass
class Quads:
    """Quad table (hittable/objects.go:117-206) with precomputed GEMM
    vectors: alpha = p_planar . cvw and beta = p_planar . cwu, where
    cvw = v x w and cwu = w x u reduce the reference's per-hit cross
    products (objects.go:184-186) to two matmuls against the ray bundle."""

    q: jnp.ndarray        # (Q, 3) corner
    u: jnp.ndarray        # (Q, 3) edge 1
    v: jnp.ndarray        # (Q, 3) edge 2
    normal: jnp.ndarray   # (Q, 3) unit normal
    d_plane: jnp.ndarray  # (Q,)   plane D = normal . q
    cvw: jnp.ndarray      # (Q, 3) v x w, w = n/(n.n)
    cwu: jnp.ndarray      # (Q, 3) w x u
    area: jnp.ndarray     # (Q,)
    mat_id: jnp.ndarray   # (Q,) int32
    active: jnp.ndarray   # (Q,) bool

    @property
    def count(self) -> int:
        return self.area.shape[0]


@struct.dataclass
class Boxes:
    """Fused box table. A reference box is six quads in a BVH
    (hittable/objects.go:208-240); when the material's texture never
    reads uv (anything but an image texture — checker/noise sample the
    3D hit point), the builder fuses them into ONE slab-test row: 6x
    fewer rows in the hot closest-hit loop with identical hit t /
    outward normal / material. (uv is not reproduced — fusion is gated
    on textures that ignore it.)

    Rotated boxes (the reference's rotateY+translate wrappers,
    hittable/transformation.go — e.g. the two Cornell boxes,
    main.go:297-305) fuse too: lo/hi are OBJECT-space bounds and the ray
    is rotated into object space per row, exactly the Media boundary
    convention. Axis-aligned rows carry the identity rotation
    (cos=1, sin=0, offset=0) and a static scene flag lets kernels skip
    the rotation math entirely when no rotated box exists."""

    lo: jnp.ndarray      # (B, 3) object-space min
    hi: jnp.ndarray      # (B, 3) object-space max
    cos_t: jnp.ndarray   # (B,) rotate-Y cos(theta)
    sin_t: jnp.ndarray   # (B,) rotate-Y sin(theta)
    offset: jnp.ndarray  # (B, 3) translate offset
    mat_id: jnp.ndarray  # (B,) int32
    active: jnp.ndarray  # (B,) bool

    @property
    def count(self) -> int:
        return self.mat_id.shape[0]


@struct.dataclass
class Triangles:
    """Triangle table (hittable/objects.go:242-465), Moller-Trumbore
    (objects.go:408-461) factored into GEMM form: with per-ray m = O x d,
        det     = -(d . cn)          cn = e0 x e1
        u * det =  m . e1 - d . c_e1v0
        v * det = -m . e0 - d . c_v0e0
        t * det =  O . cn - k        k = v0 . cn
    so the inner loop is six (N,3)@(3,T) matmuls on the MXU."""

    v0: jnp.ndarray       # (T, 3)
    e0: jnp.ndarray       # (T, 3) v1 - v0
    e1: jnp.ndarray       # (T, 3) v2 - v0
    cn: jnp.ndarray       # (T, 3) e0 x e1 (unnormalized geometric normal)
    c_e1v0: jnp.ndarray   # (T, 3) e1 x v0
    c_v0e0: jnp.ndarray   # (T, 3) v0 x e0
    k: jnp.ndarray        # (T,)   v0 . cn
    n_face: jnp.ndarray   # (T, 3) unit face normal
    vn: jnp.ndarray       # (T, 3, 3) vertex normals (face normal if absent)
    has_vn: jnp.ndarray   # (T,) bool
    uv: jnp.ndarray       # (T, 3, 2) texture coords (zeros if absent)
    has_uv: jnp.ndarray   # (T,) bool
    area: jnp.ndarray     # (T,)
    mat_id: jnp.ndarray   # (T,) int32
    active: jnp.ndarray   # (T,) bool

    @property
    def count(self) -> int:
        return self.area.shape[0]


@struct.dataclass
class Media:
    """Constant-density media (hittable/medium.go:13-62). The boundary's
    entry/exit span is computed analytically (sphere quadratic roots or
    oriented-box slab test with the rotate-Y + translate transform applied
    to the ray, matching hittable/transformation.go:25-34, 94-107)."""

    kind: jnp.ndarray             # (M,) int32 MEDIUM_*
    center: jnp.ndarray           # (M, 3) sphere center
    radius: jnp.ndarray           # (M,)   sphere radius
    cos_t: jnp.ndarray            # (M,) box rotate-Y cos(theta)
    sin_t: jnp.ndarray            # (M,) box rotate-Y sin(theta)
    offset: jnp.ndarray           # (M, 3) box translate offset
    box_min: jnp.ndarray          # (M, 3) object-space box min
    box_max: jnp.ndarray          # (M, 3) object-space box max
    neg_inv_density: jnp.ndarray  # (M,)  -1/density (medium.go:21)
    mat_id: jnp.ndarray           # (M,) int32 isotropic phase material
    active: jnp.ndarray           # (M,) bool

    @property
    def count(self) -> int:
        return self.kind.shape[0]


@struct.dataclass
class Materials:
    """Material table (hittable/materials.go). Attenuation always routes
    through the texture table: plain-color materials get a SOLID texture."""

    kind: jnp.ndarray     # (K,) int32 MAT_*
    tex_id: jnp.ndarray   # (K,) int32
    fuzz: jnp.ndarray     # (K,) metal fuzz (materials.go:60-82)
    ref_idx: jnp.ndarray  # (K,) dielectric index (materials.go:85-130)

    @property
    def count(self) -> int:
        return self.kind.shape[0]


@struct.dataclass
class Textures:
    """Texture table (hittable/texture.go:14-125)."""

    kind: jnp.ndarray       # (X,) int32 TEX_*
    color: jnp.ndarray      # (X, 3) solid albedo
    inv_scale: jnp.ndarray  # (X,) checker 1/scale (texture.go:37)
    even: jnp.ndarray       # (X, 3) checker even color
    odd: jnp.ndarray        # (X, 3) checker odd color
    scale: jnp.ndarray      # (X,) noise scale
    noise_id: jnp.ndarray   # (X,) int32 index into Perlin tables
    image_id: jnp.ndarray   # (X,) int32 index into Images

    @property
    def count(self) -> int:
        return self.kind.shape[0]


@struct.dataclass
class Perlin:
    """Per-noise-texture seeds for the gather-free hash-gradient noise
    (scene/perlin.py, replacing hittable/perlin.go:10-31's tables — see
    that module's docstring for the TPU rationale)."""

    seed: jnp.ndarray  # (P,) uint32

    @property
    def count(self) -> int:
        return self.seed.shape[0]


@struct.dataclass
class Images:
    """Decoded image textures, padded to common (Hmax, Wmax)
    (internal/imageloader/imageLoader.go:29-88)."""

    data: jnp.ndarray  # (I, Hmax, Wmax, 3) float in [0,1]
    wh: jnp.ndarray    # (I, 2) int32 (width, height)

    @property
    def count(self) -> int:
        return self.data.shape[0]


@struct.dataclass
class Lights:
    """Light-sampling list (the `lights` Hittable passed to Render;
    hittable/hittable.go:89-103). Entries reference rows of the primitive
    tables. `n` is the live count used for the 1/K mixture weight."""

    kind: jnp.ndarray     # (L,) int32 LIGHT_*
    prim_id: jnp.ndarray  # (L,) int32
    n: int = struct.field(pytree_node=False, default=0)

    @property
    def count(self) -> int:
        return self.kind.shape[0]


@struct.dataclass
class TriBVH:
    """Flattened skip-link BVH over the triangle table (scene/bvh.py).
    Built host-side with the reference's median/longest-axis policy
    (hittable/bvh.go:35-61); traversed stacklessly on device: box hit ->
    next DFS node, miss -> skip link."""

    node_min: jnp.ndarray  # (M, 3)
    node_max: jnp.ndarray  # (M, 3)
    first: jnp.ndarray     # (M,) int32
    count: jnp.ndarray     # (M,) int32 (0 = inner node)
    skip: jnp.ndarray      # (M,) int32
    order: jnp.ndarray     # (Tp,) int32 triangle ids, -1 padding
    n_nodes: int = struct.field(pytree_node=False, default=1)
    leaf_size: int = struct.field(pytree_node=False, default=8)
    # 8-wide collapse for the sublane-batched traversal kernel
    # (scene/bvh8.py / ops/pallas/traverse8.py); None when absent
    nodes8: jnp.ndarray = None   # packed (R, 128) f32 register lines
    tris8: jnp.ndarray = None    # packed (R2, 128) f32 register lines
    bvh8_dense: bool = struct.field(pytree_node=False, default=False)
    # cluster partition for the binned intersector (scene/clusters.py /
    # ops/trace.binned_closest); None when absent
    cl_lo: jnp.ndarray = None    # (K, 3) cluster box min
    cl_hi: jnp.ndarray = None    # (K, 3) cluster box max
    cl_gs: jnp.ndarray = None    # (K + 1,) i32 group offsets
    cl_lines: jnp.ndarray = None  # packed tri-group register lines
    cl_boxes: jnp.ndarray = None  # packed cluster-box lines (fused round)
    # fine-grained partition for the v2 persistent-block intersector
    # (ops/pallas/stream2.py): the per-lane (near, k) frontier replaces
    # the mask planes, so K is unbounded by sort width and clusters can
    # be small; None when the table exceeds the VMEM budget
    cl2_boxes: jnp.ndarray = None  # packed cluster-box lines
    cl2_gs: jnp.ndarray = None     # (K2 + 1,) i32 group offsets
    cl2_lines: jnp.ndarray = None  # packed tri-group lines (v2 grain)


@struct.dataclass
class Scene:
    """The complete compiled scene. The `has_*` fields are static (non-pytree)
    capability flags set by the builder so jit-compiled kernels can skip
    entire intersector / texture code paths for tables that are only padding."""

    spheres: Spheres
    quads: Quads
    triangles: Triangles
    media: Media
    materials: Materials
    textures: Textures
    perlin: Perlin
    images: Images
    lights: Lights
    background: jnp.ndarray  # (3,)
    tri_bvh: TriBVH = None
    boxes: Boxes = None
    has_boxes: bool = struct.field(pytree_node=False, default=False)
    # True when any fused box row carries a non-identity rotation; static
    # so kernels compile the per-row ray rotation only when needed
    has_rot_boxes: bool = struct.field(pytree_node=False, default=False)
    has_spheres: bool = struct.field(pytree_node=False, default=True)
    has_tri_bvh: bool = struct.field(pytree_node=False, default=False)
    has_quads: bool = struct.field(pytree_node=False, default=True)
    has_triangles: bool = struct.field(pytree_node=False, default=False)
    has_media: bool = struct.field(pytree_node=False, default=False)
    has_noise: bool = struct.field(pytree_node=False, default=False)
    has_checker: bool = struct.field(pytree_node=False, default=False)
    has_image: bool = struct.field(pytree_node=False, default=False)
    # material-kind flags: let jit drop whole shading branches per scene
    has_metal: bool = struct.field(pytree_node=False, default=True)
    has_dielectric: bool = struct.field(pytree_node=False, default=True)
    has_isotropic: bool = struct.field(pytree_node=False, default=True)
    # light-kind flags: skip unused pdf evaluators in the mixture
    has_quad_lights: bool = struct.field(pytree_node=False, default=True)
    has_sphere_lights: bool = struct.field(pytree_node=False, default=True)
    has_tri_lights: bool = struct.field(pytree_node=False, default=False)
