'''Stub `pybullet` module: save/restore state + engine-parameter no-ops, routed to the
active stub simulator (kubric.simulator.PyBullet registers itself on construction).'''

_active_sim = None


def setPhysicsEngineParameter(**kwargs):  # noqa: N802 (pybullet naming)
    pass


def saveState():  # noqa: N802
    assert _active_sim is not None, 'no active stub simulator'
    return _active_sim.save_state()


def restoreState(token):  # noqa: N802
    assert _active_sim is not None, 'no active stub simulator'
    _active_sim.restore_state(token)
