'''
Kubric-generation subsystem tests that run WITHOUT the kubric/Blender stack: import gating,
the declarative scene-type programs, and the keyword asset taxonomy.
'''

import numpy as np
import pytest

import conftest  # noqa: F401
from tcow_tpu.gen_kubric import asset_taxonomy, scene_types


def test_sim_import_gate():
    from tcow_tpu.gen_kubric.kubric_sim import KubricSimulatorRenderer
    try:
        import kubric  # noqa: F401
        pytest.skip('kubric installed; gate untestable')
    except ImportError:
        pass
    with pytest.raises(ImportError, match='kubric'):
        KubricSimulatorRenderer(None)


def test_scene_types_complete():
    assert set(scene_types.SCENE_TYPES.keys()) == {
        'gravity_bounce', 'fall_onto_carrier', 'fall_into_container',
        'slide_box_friction', 'slide_box_collide', 'box_push_carrier_slide',
        'box_push_container_slide'}
    for name, steps in scene_types.SCENE_TYPES.items():
        ops = [s['op'] for s in steps]
        assert 'settle' in ops, name
        assert ops[0] == 'background', name
        for s in steps:
            if s['op'] == 'dynamic':
                assert len(s.get('place', [])) == s['count'], name


class _FakeRng:
    def uniform(self, lo, hi=None, *a, **k):
        return np.asarray(lo, float)


class _FakeAsset:
    def __init__(self):
        self.position = np.zeros(3)
        self.velocity = np.zeros(3)
        self.mass = 1.0


class _FakeSim:
    '''Records the call sequence the scene-type interpreter makes.'''

    def __init__(self):
        self.calls = []
        self.rng = _FakeRng()
        self.scene = type('S', (), {})()
        self.scene.foreground_assets = []

    def insert_static_objects(self, **kw):
        self.calls.append(('static', kw))
        self.scene.foreground_assets += [_FakeAsset()
                                         for _ in range(kw.get('max_count', 1))]

    def insert_dynamic_objects(self, **kw):
        self.calls.append(('dynamic', kw))
        self.scene.foreground_assets += [_FakeAsset()
                                         for _ in range(kw.get('max_count', 1))]

    def simulate_frames(self, a, b):
        self.calls.append(('simulate', a, b))

    def reset_objects_velocity_friction_restitution(self):
        self.calls.append(('reset',))


def test_scene_type_interpreter_box_push_container_slide():
    sim = _FakeSim()
    scene_types.apply_setup_for_type(None, sim, 'box_push_container_slide')
    kinds = [c[0] for c in sim.calls]
    # background(4 static) -> forced container -> settle -> dynamic -> box
    assert kinds == ['static', 'static', 'simulate', 'reset', 'dynamic', 'dynamic']
    assert sim.calls[1][1]['force_containers'] == 1
    assert sim.calls[1][1]['simple_containers_only'] is True
    assert sim.calls[5][1]['force_boxes'] == 1
    # mass multiplier applied to the pushing box
    assert sim.scene.foreground_assets[-1].mass == 3.0
    # container placed at the fixed position
    assert np.allclose(sim.scene.foreground_assets[4].position, (0.0, 0.0, 2.0))


def test_scene_type_unknown_and_unimplemented():
    with pytest.raises(ValueError):
        scene_types.apply_setup_for_type(None, _FakeSim(), 'nope')
    with pytest.raises(NotImplementedError):
        scene_types.apply_setup_for_type(None, _FakeSim(), 'teleport')


def test_asset_taxonomy_keywords_and_overrides(tmp_path):
    ids = ['Room_Essentials_Bowl_Turquiose', 'Nordic_Ware_Cake_Pan', 'Reebok_Classic_Sneaker',
           'Top_Paw_Dog_Bowl_Blue', 'Sonny_School_Bus', 'Closetmaid_Premium_Fabric_Cube',
           'DPC_Handmade_Hat_Brown', 'Threshold_Dinner_Plate_Square_Rim_White_Porcelain']
    tax = asset_taxonomy.AssetTaxonomy(ids)
    assert 'Room_Essentials_Bowl_Turquiose' in tax.ids_for('container')
    assert 'Reebok_Classic_Sneaker' in tax.ids_for('shoe')
    assert 'DPC_Handmade_Hat_Brown' in tax.ids_for('hat')
    assert 'Threshold_Dinner_Plate_Square_Rim_White_Porcelain' in tax.ids_for('carrier')
    assert 'Closetmaid_Premium_Fabric_Cube' in tax.ids_for('box')
    assert 'Sonny_School_Bus' not in tax.ids_for('container')

    override = tmp_path / 'roles.json'
    override.write_text('{"container": ["Sonny_School_Bus"]}')
    tax2 = asset_taxonomy.AssetTaxonomy(ids, str(override))
    assert tax2.ids_for('container') == ['Sonny_School_Bus']
