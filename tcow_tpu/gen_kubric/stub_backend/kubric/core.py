'''Core object model of the stub kubric backend: assets, sources, scene, camera.

Emulates just enough of the kubric API for tcow_tpu/gen_kubric (see README.md). Every
quantity is deterministic in the asset id so repeated runs agree.
'''

import hashlib

import numpy as np

WORLD_UP = np.array([0.0, 0.0, 1.0])


def _hash_fracs(key: str, n: int) -> np.ndarray:
    '''n deterministic floats in [0, 1) derived from a string key.'''
    out = []
    for i in range(n):
        h = hashlib.md5(f'{key}:{i}'.encode()).digest()
        out.append(int.from_bytes(h[:8], 'little') / 2.0 ** 64)
    return np.asarray(out)


class _BlenderNode:
    def __init__(self):
        self.image = None


class _BlenderMaterial:
    def __init__(self):
        self.node_tree = type('NT', (), {})()
        self.node_tree.nodes = {'Image Texture': _BlenderNode()}


class _BlenderObject:
    def __init__(self):
        self.data = type('D', (), {})()
        self.data.materials = [_BlenderMaterial()]


class _LinkedObjects(dict):
    '''kubric exposes per-renderer backend objects via asset.linked_objects[renderer].'''

    def __missing__(self, key):
        self[key] = _BlenderObject()
        return self[key]


class Asset:

    def __init__(self, asset_id: str, name: str, bounds_dims: np.ndarray, **kwargs):
        self.asset_id = asset_id
        self.name = name
        self._dims = np.asarray(bounds_dims, np.float64)
        self.bounds = (-self._dims / 2.0, self._dims / 2.0)
        volume = float(np.prod(self._dims))
        self.metadata = {'volume': volume}
        self.mass = volume  # unit density before priors/scaling
        self.scale = 1.0
        self.position = np.zeros(3)
        self.velocity = np.zeros(3)
        self.quaternion = np.array([1.0, 0.0, 0.0, 0.0])  # (w, x, y, z)
        self.friction = 0.5
        self.restitution = 0.5
        self.static = False
        self.background = False
        self.filename = f'/stub_assets/{asset_id}'
        self.linked_objects = _LinkedObjects()
        self._frames = {}  # frame index -> (position, quaternion) snapshots
        for k, v in kwargs.items():
            setattr(self, k, v)

    @property
    def world_radius(self) -> float:
        s = float(np.max(self.scale)) if np.ndim(self.scale) else float(self.scale)
        return s * float(np.max(self._dims)) / 2.0

    def keyframe_insert(self, attr, frame):
        pos, quat = self._frames.get(frame, (None, None))
        if attr == 'position':
            pos = np.array(self.position, np.float64)
        elif attr == 'quaternion':
            quat = np.array(self.quaternion, np.float64)
        self._frames[frame] = (pos if pos is not None else np.array(self.position),
                               quat if quat is not None else np.array(self.quaternion))

    def frame_position(self, frame):
        if frame in self._frames:
            return self._frames[frame][0]
        return np.array(self.position, np.float64)


class PerspectiveCamera:

    def __init__(self, focal_length=35.0, sensor_width=32.0):
        self.focal_length = focal_length
        self.sensor_width = sensor_width
        self.position = np.zeros(3)
        self.quaternion = np.array([1.0, 0.0, 0.0, 0.0])
        self._R = np.eye(3)          # world -> camera rows (right, up, -forward)
        self._frames = {}            # frame -> (position, R)
        self._scene = None

    def look_at(self, target):
        fwd = np.asarray(target, np.float64) - np.asarray(self.position, np.float64)
        n = np.linalg.norm(fwd)
        fwd = fwd / n if n > 1e-9 else np.array([0.0, 0.0, -1.0])
        right = np.cross(fwd, WORLD_UP)
        rn = np.linalg.norm(right)
        right = right / rn if rn > 1e-9 else np.array([1.0, 0.0, 0.0])
        up = np.cross(right, fwd)
        self._R = np.stack([right, up, -fwd])

    def keyframe_insert(self, attr, frame):
        self._frames[frame] = (np.array(self.position, np.float64), self._R.copy())

    def frame_pose(self, frame):
        if frame in self._frames:
            return self._frames[frame]
        if self._frames:
            nearest = min(self._frames, key=lambda f: abs(f - frame))
            return self._frames[nearest]
        return np.array(self.position), self._R.copy()


class Scene:

    def __init__(self, frame_start=0, frame_end=23, frame_rate=12, resolution=(256, 192)):
        self.frame_start = frame_start
        self.frame_end = frame_end
        self.frame_rate = frame_rate
        self.resolution = tuple(resolution)
        self.metadata = {}
        self.assets = []
        self._camera = None

    def __iadd__(self, asset):
        self.assets.append(asset)
        return self

    @property
    def camera(self):
        return self._camera

    @camera.setter
    def camera(self, cam):
        self._camera = cam
        if cam is not None:
            cam._scene = self

    @property
    def foreground_assets(self):
        return [a for a in self.assets if not a.background]


# ---------------------------------------------------------------------------
# Asset sources
# ---------------------------------------------------------------------------

# Invented GSO-style ids covering every taxonomy role (container/carrier/hat/shoe/box)
# plus generic distractors and the canonical snitch id used by insert_snitch.
_GSO_IDS = [
    'Stub_Ceramic_Bowl_Large', 'Stub_Salad_Bowl_Teal', 'Stub_Mixing_Bowl_Steel',
    'Stub_Stock_Pot_Tall', 'Stub_Sauce_Pan_Red', 'Stub_Storage_Bin_Grey',
    'Stub_Wicker_Basket_Round', 'Stub_Mop_Bucket_Yellow', 'Stub_Serving_Tray_Wood',
    'Stub_Soup_Dish_White', 'Stub_Flower_Planter_Clay', 'Stub_Pasta_Colander_Green',
    'Stub_Casserole_Deep', 'Stub_Bath_Tub_Toy', 'Stub_Shower_Caddy_Wire',
    'Stub_Water_Pitcher_Glass', 'Stub_Dinner_Plate_Round', 'Stub_Cutting_Board_Bamboo',
    'Stub_Baking_Sheet_Flat', 'Stub_Drink_Coaster_Cork', 'Stub_Cookie_Tin_Blue',
    'Stub_Serving_Platter_Oval', 'Stub_Party_Hat_Cone', 'Stub_Bike_Helmet_Kids',
    'Stub_Straw_Sombrero', 'Stub_Wool_Beanie_Grey', 'Stub_Running_Sneaker_Left',
    'Stub_Hiking_Boot_Brown', 'Stub_Beach_Sandal_Blue', 'Stub_House_Slipper_Soft',
    'Stub_Soccer_Cleat_Youth', 'Stub_Cardboard_Box_Small', 'Stub_Moving_Carton_Taped',
    'Stub_Wood_Crate_Slatted', 'Stub_Toy_Cube_Stacking', 'Stub_Juice_Pack_Six',
    'Stub_Clay_Brick_Standard', 'Stub_Rubber_Duck_Classic', 'Stub_Toy_School_Bus',
    'Stub_Action_Figure_Robot', 'Stub_Plush_Bear_Small', 'Stub_Ceramic_Vase_Tall',
    'Stub_Desk_Lamp_Bendy', 'Stub_Alarm_Clock_Retro', 'Stub_Garden_Gnome_Painted',
    'Stub_Picture_Frame_Gold', 'Stub_Spray_Bottle_Clear', 'Stub_Watering_Can_Metal',
    'Stub_Toy_Dinosaur_Green', 'Stub_Stacking_Ring_Baby',
    'Vtech_Roll_Learn_Turtle',
]
_HDRI_IDS = [f'stub_hdri_{i:03d}' for i in range(16)]
_KUBASIC_IDS = ['dome']


class AssetSource:

    def __init__(self, ids, kind):
        self._ids = list(ids)
        self._kind = kind

    @classmethod
    def from_manifest(cls, manifest: str):
        if 'GSO' in manifest:
            return cls(_GSO_IDS, 'gso')
        if 'HDRI' in manifest:
            return cls(_HDRI_IDS, 'hdri')
        if 'KuBasic' in manifest:
            return cls(_KUBASIC_IDS, 'kubasic')
        raise ValueError(f'unknown manifest {manifest}')

    def all_asset_ids(self):
        return list(self._ids)

    def get_test_split(self, fraction=0.1):
        n_test = max(1, int(round(len(self._ids) * fraction)))
        test = sorted(self._ids, key=lambda a: _hash_fracs(a, 1)[0])[:n_test]
        train = [a for a in self._ids if a not in set(test)]
        return train, test

    def create(self, asset_id: str, name: str = None, **kwargs):
        name = name or asset_id
        if self._kind == 'kubasic' and asset_id == 'dome':
            dims = np.array([40.0, 40.0, 20.0])
        else:
            dims = 0.7 + 0.6 * _hash_fracs(asset_id, 3)
        return Asset(asset_id, name, dims, **kwargs)


# ---------------------------------------------------------------------------
# Samplers
# ---------------------------------------------------------------------------

def sample_point_in_half_sphere_shell(inner_radius, outer_radius, offset, rng=None):
    rng = rng or np.random
    for _ in range(1024):
        p = rng.uniform(-outer_radius, outer_radius, size=3)
        p[2] = abs(p[2]) + offset
        r = np.linalg.norm(p)
        if inner_radius <= r <= outer_radius:
            return p
    raise RuntimeError('could not sample point in shell')


def position_sampler(region):
    lo, hi = np.asarray(region[0], np.float64), np.asarray(region[1], np.float64)

    def _sample(asset, rng):
        asset.position = rng.uniform(lo, hi)
    return _sample


def rotation_sampler(axis=None):
    def _sample(asset, rng):
        theta = rng.uniform(0.0, 2.0 * np.pi)
        if axis == 'Z' or axis == 'z':
            ax = np.array([0.0, 0.0, 1.0])
        elif axis is None:
            v = rng.uniform(-1.0, 1.0, size=3)
            ax = v / (np.linalg.norm(v) + 1e-9)
        else:
            ax = np.asarray({'X': (1, 0, 0), 'Y': (0, 1, 0)}[axis.upper()], np.float64)
        asset.quaternion = np.array([np.cos(theta / 2), *(np.sin(theta / 2) * ax)])
    return _sample


def resample_while(asset, samplers, condition, max_trials=100, rng=None):
    rng = rng or np.random
    for _ in range(max_trials):
        for s in samplers:
            s(asset, rng)
        if not condition(asset):
            return
    raise RuntimeError(f'resample_while exceeded {max_trials} trials for {asset.name}')
