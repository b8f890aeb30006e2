'''
Kubric simulator + renderer wrapper.

Capability port of /root/reference/gen_kubric/kubric_sim.py:30-871 (MOVi-F-style scenes with
forced containers/carriers, linear camera paths, optional estimated-mass priors, divided
per-instance amodal re-rendering). Requires `kubric`, `bpy` (Blender-as-module) and
`pybullet`, which must only be imported inside the process that uses them
(kubric_sim.py:45-48); this module raises a clear error when they are absent.
'''

import copy
import os
import tempfile
import time
from typing import Optional, Tuple

import numpy as np

from tcow_tpu.gen_kubric.asset_taxonomy import AssetTaxonomy

CONTAINER_CARRIER_SPAWN_REGION = [(-4, -4, 0), (4, 4, 4)]
STATIC_SPAWN_REGION = [(-7, -7, 0), (7, 7, 7)]
DYNAMIC_SPAWN_REGION = [(-5, -5, 1), (5, 5, 6)]
VELOCITY_RANGE = [(-4, -4, -1), (4, 4, 1)]

GSO_MANIFEST = 'gs://kubric-public/assets/GSO/GSO.json'
HDRI_MANIFEST = 'gs://kubric-public/assets/HDRI_haven/HDRI_haven.json'
KUBASIC_MANIFEST = 'gs://kubric-public/assets/KuBasic/KuBasic.json'

SNITCH_ASSET_ID = 'Vtech_Roll_Learn_Turtle'  # the canonical snitch (kubric_sim.py:473)


def _rotate_yaw(xyz, yaw_deg):
    r = np.deg2rad(yaw_deg)
    m = np.array([[np.cos(r), -np.sin(r), 0.0], [np.sin(r), np.cos(r), 0.0],
                  [0.0, 0.0, 1.0]])
    return (np.asarray(xyz, np.float64) @ m.T).astype(np.float32)


class KubricSimulatorRenderer:
    '''One PyBullet+Blender context, reused across scenes within a process.'''

    def __init__(self, logger, frame_width=256, frame_height=192, num_frames=24,
                 frame_rate=12, motion_blur=True, render_samples_per_pixel=32,
                 split_backgrounds=False, split_objects=False, render_use_gpu=False,
                 render_cpu_threads=-1, scratch_dir=None, mass_est_fp=None,
                 dome_friction_range=(0.3, 0.4), dome_restit_range=(0.6, 0.7),
                 object_friction_range=(0.4, 0.5), object_restit_range=(0.6, 0.7),
                 taxonomy_override_json=None):
        try:
            import bpy
            import kubric as kb
            import kubric.simulator  # noqa: F401
            import kubric.renderer  # noqa: F401
        except ImportError as e:
            raise ImportError(
                'Kubric dataset generation needs the kubric + Blender-bpy + pybullet stack '
                '(a separate CPU environment, see the kubric project docs); it is not part '
                'of the TPU training image.') from e
        self.bpy = bpy
        self.kb = kb
        self.logger = logger
        self.frame_width = frame_width
        self.frame_height = frame_height
        self.num_frames = num_frames
        self.frame_rate = frame_rate
        self.motion_blur = motion_blur
        self.render_samples_per_pixel = render_samples_per_pixel
        self.split_backgrounds = split_backgrounds
        self.split_objects = split_objects
        self.render_cpu_threads = render_cpu_threads
        self.dome_friction_range = dome_friction_range
        self.dome_restit_range = dome_restit_range
        self.object_friction_range = object_friction_range
        self.object_restit_range = object_restit_range

        self.scratch_dir = scratch_dir or tempfile.mkdtemp()
        os.makedirs(self.scratch_dir, exist_ok=True)
        self.scene = None
        self.simulator = None
        self.renderer = None

        self.gso_source = kb.AssetSource.from_manifest(GSO_MANIFEST)
        self.hdri_source = kb.AssetSource.from_manifest(HDRI_MANIFEST)
        self.kubasic_source = kb.AssetSource.from_manifest(KUBASIC_MANIFEST)
        self.taxonomy = AssetTaxonomy(self.gso_source.all_asset_ids(),
                                      taxonomy_override_json)

        if render_cpu_threads >= 1:
            bpy.context.scene.render.threads_mode = 'FIXED'
            bpy.context.scene.render.threads = render_cpu_threads
        os.environ['KUBRIC_USE_GPU'] = '1' if render_use_gpu else '0'

        # Optional estimated-mass priors: csv of (asset_id, sample list); mass range is
        # mean +/- 50% (kubric_sim.py:113-123).
        self.mass_min_max = {}
        if mass_est_fp is not None:
            import pandas as pd
            rows = pd.read_csv(mass_est_fp, header=None, names=['id', 'samples'])
            for aid, samples in rows.values:
                s = np.fromstring(str(samples)[1:-1], dtype=np.float32, sep=' ')
                self.mass_min_max[aid] = (s.mean() * 0.5, s.mean() * 1.5)

    # ------------------------------------------------------------------ scene setup

    def prepare_next_scene(self, phase: str, random_seed: int,
                           camera_yaw_deg: Optional[float] = None) -> float:
        start = time.time()
        if 'val' in phase:
            phase = 'train'  # val shares the train split (kubric_sim.py:229-233)
        assert phase in ('train', 'test')
        self.phase = phase
        self.random_seed = random_seed
        self.rng = np.random.RandomState(seed=random_seed)

        kb = self.kb
        self.scene = kb.Scene(frame_start=0, frame_end=self.num_frames - 1,
                              frame_rate=self.frame_rate,
                              resolution=(self.frame_width, self.frame_height))
        # PyBullet instance is reused for the process lifetime; Blender is rebuilt per scene
        # (kubric_sim.py:248-260).
        if self.simulator is None:
            self.simulator = kb.simulator.PyBullet(self.scene, scratch_dir=self.scratch_dir)
        else:
            self.simulator.scene = self.scene
            self.simulator.scratch_dir = self.scratch_dir
        blur = self.rng.uniform(0.4, 0.8) if self.motion_blur else 0.0
        self.renderer = kb.renderer.Blender(
            self.scene, scratch_dir=self.scratch_dir, adaptive_sampling=False,
            use_denoising=True, samples_per_pixel=self.render_samples_per_pixel,
            motion_blur=blur)

        # HDRI dome background.
        if self.split_backgrounds:
            train_ids, test_ids = self.hdri_source.get_test_split(fraction=0.1)
            subset = train_ids if phase == 'train' else test_ids
        else:
            subset = self.hdri_source.all_asset_ids()
        hdri_id = self.rng.choice(subset)
        background_hdri = self.hdri_source.create(asset_id=hdri_id, name='bg_hdri')
        self.scene.metadata['background'] = hdri_id
        self.dome = self.kubasic_source.create(asset_id='dome', name='dome', friction=1.0,
                                               restitution=0.0, static=True, background=True)
        self.scene += self.dome
        dome_blender = self.dome.linked_objects[self.renderer]
        tex = dome_blender.data.materials[0].node_tree.nodes['Image Texture']
        tex.image = self.bpy.data.images.load(background_hdri.filename)
        self.renderer._set_ambient_light_hdri(background_hdri.filename)

        if camera_yaw_deg is None:
            camera_yaw_deg = self.rng.uniform(0.0, 360.0)
        self._setup_camera(start_yaw_deg=camera_yaw_deg, first_time=True)
        return time.time() - start

    def _setup_camera(self, start_yaw_deg=0.0, first_time=False):
        '''Linear camera path inside a half-sphere shell, keyframed one frame beyond both
        ends for flow consistency (kubric_sim.py:135-183).'''
        kb = self.kb
        self.scene.camera = kb.PerspectiveCamera(focal_length=34.0, sensor_width=32.0)
        if first_time:
            speed = self.rng.uniform(0.0, 8.0)
            r0 = self.rng.uniform(11.0, 13.0)
            z0 = self.rng.uniform(0.1, r0 - 1.0)
            xy = np.sqrt(r0 ** 2 - z0 ** 2)
            fix_start = (xy * np.cos(np.deg2rad(start_yaw_deg)),
                         xy * np.sin(np.deg2rad(start_yaw_deg)), z0)
            cam_start, cam_end = self.construct_linear_camera_motion(
                speed, inner_radius=10.0, outer_radius=13.0, z_offset=0.1,
                fix_start=fix_start)
            look = np.array([self.rng.uniform(-1.0, 1.0), self.rng.uniform(-1.0, 1.0),
                             self.rng.uniform(0.0, 2.0)])
        else:
            rel = start_yaw_deg - self._last_yaw
            cam_start = _rotate_yaw(self._last_start, rel)
            cam_end = _rotate_yaw(self._last_end, rel)
            look = _rotate_yaw(self._last_look, rel)
        for frame in range(-1, self.num_frames + 2):
            interp = (frame + 1) / (self.num_frames + 3)
            self.scene.camera.position = ((1.0 - interp) * np.array(cam_start) +
                                          interp * np.array(cam_end))
            self.scene.camera.look_at(look)
            self.scene.camera.keyframe_insert('position', frame)
            self.scene.camera.keyframe_insert('quaternion', frame)
        self._last_yaw, self._last_start, self._last_end, self._last_look = \
            start_yaw_deg, cam_start, cam_end, look

    def set_camera_yaw(self, new_yaw_deg: float) -> float:
        start = time.time()
        self._setup_camera(start_yaw_deg=new_yaw_deg, first_time=False)
        return time.time() - start

    def construct_linear_camera_motion(self, movement_speed, inner_radius=9.0,
                                       outer_radius=12.0, z_offset=0.1, fix_start=None):
        for _ in range(1024):
            if fix_start is None:
                start = np.array(self.kb.sample_point_in_half_sphere_shell(
                    inner_radius, outer_radius, z_offset))
            else:
                start = np.array(fix_start)
            direction = self.rng.rand(3) - 0.5
            end = start + direction / (np.linalg.norm(direction) + 1e-7) * movement_speed
            if inner_radius <= np.linalg.norm(end) <= outer_radius and end[2] > z_offset:
                return start, end
        raise RuntimeError('Could not find a valid camera path.')

    # ------------------------------------------------------------------ objects

    def _pick_asset(self, object_kind: str, allow_complex=True) -> Tuple[str, bool]:
        '''container may be a generic container, a hat (5%, upside down) or a shoe (10%)
        (kubric_sim.py:202-211).'''
        upside_down = False
        if object_kind == 'any':
            if self.split_objects:
                train_ids, test_ids = self.gso_source.get_test_split(fraction=0.1)
                subset = train_ids if self.phase == 'train' else test_ids
            else:
                subset = self.gso_source.all_asset_ids()
        elif object_kind == 'container':
            dice = self.rng.rand()
            if allow_complex and dice < 0.05:
                subset = self.taxonomy.ids_for('hat')
                upside_down = True
            elif allow_complex and dice < 0.15:
                subset = self.taxonomy.ids_for('shoe')
            else:
                subset = self.taxonomy.ids_for('container')
        elif object_kind in ('carrier', 'box'):
            subset = self.taxonomy.ids_for(object_kind)
        else:
            raise ValueError(object_kind)
        return self.rng.choice(subset), upside_down

    def _apply_mass_prior(self, asset_id, obj):
        obj.metadata['auto_mass'] = obj.mass
        obj.metadata['auto_density'] = obj.mass / obj.metadata['volume']
        if asset_id in self.mass_min_max:
            prior = max(self.rng.uniform(*self.mass_min_max[asset_id]), 1e-4)
            obj.mass = np.sqrt(prior * obj.metadata['auto_mass'])  # geometric mean
            obj.metadata['override_mass'] = obj.mass
        elif self.mass_min_max:
            self.rng.uniform(0.5, 1.5)  # keep the RNG stream aligned (kubric_sim.py:336-338)
        return obj

    def _scale_to_diameter(self, obj, axis_diameter):
        scale = axis_diameter / np.max(obj.bounds[1] - obj.bounds[0])
        obj.scale = scale
        obj.metadata['axis_diameter'] = axis_diameter
        obj.metadata['scale_factor'] = scale
        obj.metadata['mass_pre'] = obj.mass
        obj.mass *= scale ** 3.0  # volumetric scaling
        obj.metadata['mass_post'] = obj.mass

    def insert_static_objects(self, min_count=8, max_count=12, force_containers=0,
                              force_carriers=0, any_diameter_range=(0.75, 2.5),
                              container_carrier_diameter_range=(1.25, 3.0),
                              simple_containers_only=False) -> float:
        start = time.time()
        total = self.rng.randint(min_count, max_count + 1)
        kinds = ['container'] * force_containers + ['carrier'] * force_carriers + \
            ['any'] * max(total - force_containers - force_carriers, 0)
        for i, kind in enumerate(kinds):
            asset_id, upside_down = self._pick_asset(
                kind, allow_complex=not simple_containers_only)
            obj = self.gso_source.create(asset_id=asset_id, name=f'static_{i:03d}')
            obj = self._apply_mass_prior(asset_id, obj)
            diameter = self.rng.uniform(*any_diameter_range) if kind == 'any' \
                else self.rng.uniform(*container_carrier_diameter_range)
            self._scale_to_diameter(obj, diameter)
            if upside_down and kind in ('container', 'carrier'):
                obj.quaternion = np.array([0, 1, 0, 0])  # 180deg around X (hats open-side-up)
            obj.metadata['initial_quaternion'] = obj.quaternion
            self.scene += obj
            rot_axis = 'Z' if kind in ('container', 'carrier') else None
            region = STATIC_SPAWN_REGION if kind == 'any' else \
                CONTAINER_CARRIER_SPAWN_REGION
            self.move_until_no_overlap(obj, rotation_axis=rot_axis, spawn_region=region)
            obj.friction = 1.0
            obj.restitution = 0.0
            obj.metadata.update(insert_order=i, object_kind=kind, is_dynamic=False)
        return time.time() - start

    def insert_dynamic_objects(self, min_count=4, max_count=6, force_boxes=0,
                               any_diameter_range=(0.5, 2.0),
                               box_diameter_range=(0.75, 2.0)) -> float:
        start = time.time()
        total = self.rng.randint(min_count, max_count + 1)
        kinds = ['box'] * force_boxes + ['any'] * max(total - force_boxes, 0)
        for i, kind in enumerate(kinds):
            asset_id, _ = self._pick_asset(kind)
            obj = self.gso_source.create(asset_id=asset_id, name=f'dynamic_{i:03d}')
            obj = self._apply_mass_prior(asset_id, obj)
            diameter = self.rng.uniform(*any_diameter_range) if kind == 'any' \
                else self.rng.uniform(*box_diameter_range)
            self._scale_to_diameter(obj, diameter)
            self.scene += obj
            self.move_until_no_overlap(obj, rotation_axis='Z' if kind == 'box' else None,
                                       spawn_region=DYNAMIC_SPAWN_REGION)
            # Horizontal velocity biased toward the scene center (kubric_sim.py:454-459).
            vel = self.rng.uniform(*VELOCITY_RANGE)
            pull = np.array([obj.position[0], obj.position[1], 0.0])
            pull_factor = self.rng.uniform(0.6, 1.2)
            obj.velocity = vel - pull * pull_factor
            obj.friction = self.rng.uniform(*self.object_friction_range)
            obj.restitution = self.rng.uniform(*self.object_restit_range)
            obj.metadata.update(init_pull_factor=pull_factor, insert_order=i,
                                object_kind=kind, is_dynamic=True, is_snitch=False)
        return time.time() - start

    def insert_snitch(self, at_x=0.0, at_y=0.0, at_z=4.5, vel_x=0.0, vel_y=0.0, vel_z=-3.5,
                      size_meters=0.35, gso_asset_id=SNITCH_ASSET_ID) -> float:
        start = time.time()
        obj = self.gso_source.create(asset_id=gso_asset_id, name='snitch')
        self._scale_to_diameter(obj, size_meters)
        self.scene += obj
        obj.position = np.array([at_x, at_y, at_z])
        obj.velocity = np.array([vel_x, vel_y, vel_z])
        obj.metadata.update(is_dynamic=True, is_snitch=True)
        self.scene.metadata['insert_snitch_args'] = dict(
            at=(at_x, at_y, at_z), vel=(vel_x, vel_y, vel_z), size_meters=size_meters,
            gso_asset_id=gso_asset_id)
        return time.time() - start

    def reset_objects_velocity_friction_restitution(self) -> float:
        start = time.time()
        for obj in self.scene.foreground_assets:
            if hasattr(obj, 'velocity'):
                obj.velocity = np.zeros(3)
                obj.friction = self.rng.uniform(*self.object_friction_range)
                obj.restitution = self.rng.uniform(*self.object_restit_range)
        self.dome.friction = self.rng.uniform(*self.dome_friction_range)
        self.dome.restitution = self.rng.uniform(*self.dome_restit_range)
        return time.time() - start

    def perturb_object_positions(self, max_offset_meters=0.01) -> float:
        start = time.time()
        for obj in self.scene.foreground_assets:
            delta = np.array([self.rng.uniform(-max_offset_meters, max_offset_meters),
                              self.rng.uniform(-max_offset_meters, max_offset_meters),
                              self.rng.uniform(0.0, max_offset_meters)])
            obj.position = obj.position + delta
            obj.metadata['perturbation'] = delta
        return time.time() - start

    def move_until_no_overlap(self, asset, rotation_axis=None,
                              spawn_region=((-1, -1, -1), (1, 1, 1)), max_trials=100):
        return self.kb.resample_while(
            asset,
            samplers=[self.kb.rotation_sampler(axis=rotation_axis),
                      self.kb.position_sampler(spawn_region)],
            condition=self.simulator.check_overlap, max_trials=max_trials, rng=self.rng)

    # ------------------------------------------------------------------ sim + render

    def simulate_frames(self, frame_start: int, frame_end: int):
        start = time.time()
        animations, collisions = self.simulator.run(frame_start, frame_end)
        self.last_animations, self.last_collisions = animations, collisions
        self.last_data_stack = None
        return animations, collisions, time.time() - start

    def render_frames(self, frame_start: int, frame_end: int,
                      return_layers=('rgba', 'forward_flow', 'depth', 'normal',
                                     'object_coordinates', 'segmentation')):
        '''Renders + post-processes: instance IDs re-ranked by total visibility so id 1 is
        the most visible; VALO subset recorded (kubric_sim.py:561-616).'''
        start = time.time()
        kb = self.kb
        if self.render_cpu_threads >= 1:
            self.bpy.context.scene.render.threads_mode = 'FIXED'
            self.bpy.context.scene.render.threads = self.render_cpu_threads
        data_stack = self.renderer.render(frames=list(range(frame_start, frame_end + 1)),
                                          return_layers=list(return_layers))
        kb.compute_visibility(data_stack['segmentation'], self.scene.assets)
        self.sorted_fg_assets = sorted(
            self.scene.foreground_assets,
            key=lambda a: np.sum(a.metadata['visibility']), reverse=True)
        self.sorted_valo_fg_assets = [a for a in self.sorted_fg_assets
                                      if np.max(a.metadata['visibility']) > 0]
        data_stack['segmentation'] = kb.adjust_segmentation_idxs(
            data_stack['segmentation'], self.scene.assets, self.sorted_fg_assets)
        self.scene.metadata['num_instances'] = len(self.sorted_fg_assets)
        self.scene.metadata['num_valo_instances'] = len(self.sorted_valo_fg_assets)
        self.last_data_stack = data_stack
        self.last_div_data = None
        return data_stack, time.time() - start

    def render_frames_divided_objects(self, frame_start: int, frame_end: int,
                                      return_layers=('rgba', 'depth', 'segmentation')):
        '''Amodal masks via K re-renders, one per VALO instance with all others scaled to 0
        (there is no visibility flag in Blender-via-kubric; kubric_sim.py:618-672). This is
        the dominant generation cost (K x full render).'''
        start = time.time()
        K = len(self.sorted_valo_fg_assets)
        scales = copy.deepcopy([a.scale for a in self.sorted_valo_fg_assets])
        raw_stacks = []
        self.logger.info(f'render_frames_divided_objects with {K} VALO instances...')
        for k in range(K):
            for a in self.sorted_fg_assets:
                a.scale = 0.0
            self.sorted_valo_fg_assets[k].scale = copy.deepcopy(scales[k])
            stack = self.renderer.render(frames=list(range(frame_start, frame_end + 1)),
                                         return_layers=list(return_layers))
            stack['segmentation'] = self.kb.adjust_segmentation_idxs(
                stack['segmentation'], self.scene.assets, self.sorted_fg_assets)
            raw_stacks.append(stack)
        # Restore scales for any later use.
        for k in range(K):
            self.sorted_valo_fg_assets[k].scale = scales[k]
        div_data = {layer: np.stack([s[layer] for s in raw_stacks], axis=-1)
                    for layer in return_layers}
        self.last_div_data = div_data
        return div_data, time.time() - start

    def get_metadata(self, exclude_collisions=False):
        start = time.time()
        kb = self.kb
        kb.post_processing.compute_bboxes(self.last_data_stack['segmentation'],
                                          self.sorted_fg_assets)
        metadata = {
            'scene': kb.get_scene_metadata(self.scene),
            'camera': kb.get_camera_info(self.scene.camera),
            'instances': kb.get_instance_info(self.scene, self.sorted_fg_assets),
        }
        if not exclude_collisions:
            metadata['collisions'] = kb.process_collisions(
                self.last_collisions, self.scene, assets_subset=self.sorted_fg_assets)
        metadata['dome'] = kb.get_instance_info(self.scene, [self.dome])[0]
        metadata['random_seed'] = self.random_seed
        self.last_metadata = metadata
        return metadata, time.time() - start

    def write_all_data(self, output_dir: str) -> float:
        start = time.time()
        os.makedirs(output_dir, exist_ok=True)
        self.kb.write_image_dict(self.last_data_stack, output_dir, is_divided=False)
        if self.last_div_data is not None:
            self.kb.write_image_dict(self.last_div_data, output_dir, is_divided=True)
        return time.time() - start


# Backwards-compatible alias matching the reference class name.
MyKubricSimulatorRenderer = KubricSimulatorRenderer
