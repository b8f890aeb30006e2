'''
Benchmark scene types for isolated physical concepts.

Capability port of /root/reference/gen_kubric/scene_type_utils.py:17-235: seven implemented
setups (gravity_bounce, fall_onto_carrier, fall_into_container, slide_box_friction,
slide_box_collide, box_push_carrier_slide, box_push_container_slide) expressed declaratively:
each is a list of steps (static/dynamic insertion with role forcing, settle simulation,
explicit position/velocity sampling boxes, mass multipliers) interpreted by
`apply_setup_for_type`.
'''

from typing import Dict, List

import numpy as np

# Each step: dict(op=..., **kwargs). Supported ops:
#   background(along_x)                 4 static distractors at the scene edges
#   settle()                            simulate -100..-1 + reset velocities/materials
#   static(force_containers/force_carriers, diameter, simple, place)
#   dynamic(count, force_boxes, diameter, place, vel, mass_mult)
# `place` / `vel` are (lo, hi) uniform boxes applied to the most recently inserted object.

SCENE_TYPES: Dict[str, List[dict]] = {
    'gravity_bounce': [
        dict(op='background', along_x=True),
        dict(op='settle'),
        dict(op='dynamic', count=2, diameter=(1.0, 2.0),
             place=[((-1.0, -2.5, 4.0), (1.0, -1.5, 6.0)),
                    ((-1.0, 1.5, 4.0), (1.0, 2.5, 6.0))],
             vel=[((-0.5, -0.5, -3.0), (0.5, 0.5, -1.0))] * 2),
    ],
    'fall_onto_carrier': [
        dict(op='background', along_x=False),
        dict(op='static', force_carriers=1, diameter=(2.0, 3.0),
             place=[((0.0, 0.0, 1.5), (0.0, 0.0, 1.5))]),
        dict(op='settle'),
        dict(op='dynamic', count=1, diameter=(0.5, 1.5),
             place=[((-0.5, -0.5, 4.0), (0.5, -0.5, 6.0))],
             vel=[((-0.5, -0.5, -1.0), (0.5, 0.5, 0.0))]),
    ],
    'fall_into_container': [
        dict(op='background', along_x=False),
        dict(op='static', force_containers=1, diameter=(2.0, 3.0), simple=True,
             place=[((0.0, 0.0, 1.5), (0.0, 0.0, 1.5))]),
        dict(op='settle'),
        dict(op='dynamic', count=1, diameter=(0.5, 1.5),
             place=[((-0.5, -0.5, 4.0), (0.5, -0.5, 6.0))],
             vel=[((-0.5, -0.5, -1.0), (0.5, 0.5, 0.0))]),
    ],
    'slide_box_friction': [
        dict(op='background', along_x=True),
        dict(op='settle'),
        dict(op='dynamic', count=2, force_boxes=2, box_diameter=(1.5, 2.0),
             place=[((1.5, -2.0, 1.0), (2.0, -1.5, 1.5)),
                    ((-2.0, 1.5, 1.0), (-1.5, 2.0, 1.5))],
             vel=[((0.0, 4.5, 0.0), (0.0, 5.0, 0.0)),
                  ((0.0, -5.0, 0.0), (0.0, -4.5, 0.0))]),
    ],
    'slide_box_collide': [
        dict(op='background', along_x=True),
        dict(op='settle'),
        dict(op='dynamic', count=2, force_boxes=2, box_diameter=(1.5, 2.0),
             place=[((0.0, -4.0, 1.0), (0.0, -3.5, 1.5)),
                    ((0.0, 3.5, 1.0), (0.0, 4.0, 1.5))],
             vel=[((0.0, 4.5, 0.0), (0.0, 5.0, 0.0)),
                  ((0.0, -5.0, 0.0), (0.0, -4.5, 0.0))]),
    ],
    'box_push_carrier_slide': [
        dict(op='background', along_x=True),
        dict(op='static', force_carriers=1, diameter=(2.0, 3.0),
             place=[((0.0, 0.0, 1.5), (0.0, 0.0, 1.5))]),
        dict(op='settle'),
        dict(op='dynamic', count=1, diameter=(0.5, 1.5),
             place=[((-0.5, -0.5, 2.0), (0.5, -0.5, 4.0))],
             vel=[((-0.5, -0.5, -1.0), (0.5, 0.5, 0.0))]),
        dict(op='dynamic', count=1, force_boxes=1, box_diameter=(1.5, 2.0),
             place=[((0.0, 4.5, 1.0), (0.0, 5.0, 1.5))],
             vel=[((0.0, -6.0, 0.0), (0.0, -5.5, 0.0))], mass_mult=2.0),
    ],
    'box_push_container_slide': [
        dict(op='background', along_x=True),
        dict(op='static', force_containers=1, diameter=(2.0, 2.5), simple=True,
             place=[((0.0, 0.0, 2.0), (0.0, 0.0, 2.0))]),
        dict(op='settle'),
        dict(op='dynamic', count=1, diameter=(0.5, 1.5),
             place=[((-0.5, -0.5, 2.5), (0.5, -0.5, 4.5))],
             vel=[((-0.5, -0.5, -1.0), (0.5, 0.5, 0.0))]),
        dict(op='dynamic', count=1, force_boxes=1, box_diameter=(1.5, 2.0),
             place=[((0.0, 5.0, 1.0), (0.0, 5.5, 1.5))],
             vel=[((0.0, -6.0, 0.0), (0.0, -5.5, 0.0))], mass_mult=3.0),
    ],
}

# Planned in the reference but not implemented there either (export_kub_cont.py:28-41).
UNIMPLEMENTED_SCENE_TYPES = ('teleport', 'swap_identity', 'penetrate_wall', 'clone_split')


def _background_static(sim, along_x: bool):
    '''Four static distractors at the scene edges (scene_type_utils.py:17-44).'''
    sim.insert_static_objects(min_count=4, max_count=4, any_diameter_range=(1.0, 2.0))
    fg = sim.scene.foreground_assets
    if along_x:
        boxes = [((-6.0, -2.0, 1.5), (-4.0, -1.0, 1.5)),
                 ((-6.0, 1.0, 1.5), (-4.0, 2.0, 1.5)),
                 ((4.0, -2.0, 1.5), (6.0, -1.0, 1.5)),
                 ((4.0, 1.0, 1.5), (6.0, 2.0, 1.5))]
    else:
        boxes = [((-6.0, -2.0, 1.5), (-4.0, -2.0, 1.5)),
                 ((-2.0, -6.0, 1.5), (2.0, -4.0, 1.5)),
                 ((4.0, -2.0, 1.5), (6.0, -2.0, 1.5)),
                 ((-2.0, 4.0, 1.5), (2.0, 6.0, 1.5))]
    for i, (lo, hi) in enumerate(boxes):
        fg[-4 + i].position = sim.rng.uniform(lo, hi)


def apply_setup_for_type(logger, sim, scene_type: str):
    '''Interprets a SCENE_TYPES program against a KubricSimulatorRenderer.'''
    if scene_type in UNIMPLEMENTED_SCENE_TYPES:
        raise NotImplementedError(f'scene type {scene_type} is not implemented '
                                  '(same as the reference)')
    steps = SCENE_TYPES.get(scene_type)
    if steps is None:
        raise ValueError(f'Unknown scene type: {scene_type}')
    for step in steps:
        op = step['op']
        if op == 'background':
            _background_static(sim, step['along_x'])
        elif op == 'settle':
            sim.simulate_frames(-100, -1)
            sim.reset_objects_velocity_friction_restitution()
        elif op == 'static':
            sim.insert_static_objects(
                min_count=1, max_count=1,
                force_containers=step.get('force_containers', 0),
                force_carriers=step.get('force_carriers', 0),
                container_carrier_diameter_range=step.get('diameter', (1.25, 3.0)),
                simple_containers_only=step.get('simple', False))
            for i, (lo, hi) in enumerate(step.get('place', [])):
                sim.scene.foreground_assets[-1 + i].position = \
                    np.asarray(lo) if lo == hi else sim.rng.uniform(lo, hi)
        elif op == 'dynamic':
            n = step['count']
            sim.insert_dynamic_objects(
                min_count=n, max_count=n, force_boxes=step.get('force_boxes', 0),
                any_diameter_range=step.get('diameter', (0.5, 2.0)),
                box_diameter_range=step.get('box_diameter', (0.75, 2.0)))
            fg = sim.scene.foreground_assets
            for i, (lo, hi) in enumerate(step.get('place', [])):
                fg[-n + i].position = sim.rng.uniform(lo, hi)
            for i, (lo, hi) in enumerate(step.get('vel', [])):
                fg[-n + i].velocity = sim.rng.uniform(lo, hi)
            if 'mass_mult' in step:
                fg[-1].mass *= step['mass_mult']
        else:
            raise ValueError(op)
