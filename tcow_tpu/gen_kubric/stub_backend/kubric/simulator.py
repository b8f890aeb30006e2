'''Stub physics: ballistic integration, ground plane, sphere-sphere impulses.

Container/carrier-role statics are permeable (no collision response) so dynamics can come
to rest inside them, producing genuine containment/occlusion configurations for the
downstream annotation pipeline.
'''

import numpy as np

GRAVITY = np.array([0.0, 0.0, -9.81])
SUBSTEPS = 4


def _is_permeable(asset):
    return asset.metadata.get('object_kind') in ('container', 'carrier')


class PyBullet:

    def __init__(self, scene, scratch_dir=None):
        self.scene = scene
        self.scratch_dir = scratch_dir
        self._saved_states = {}
        self._next_token = 1
        # Register with the stub pybullet module so pb.saveState/restoreState reach us.
        import pybullet
        pybullet._active_sim = self

    # -------------------------------------------------------------- state snapshots
    def save_state(self):
        token = self._next_token
        self._next_token += 1
        self._saved_states[token] = [
            (a, np.array(a.position), np.array(a.velocity), np.array(a.quaternion))
            for a in self.scene.assets]
        return token

    def restore_state(self, token):
        for a, pos, vel, quat in self._saved_states[token]:
            a.position, a.velocity, a.quaternion = np.array(pos), np.array(vel), \
                np.array(quat)

    # -------------------------------------------------------------- queries
    def check_overlap(self, asset):
        r = asset.world_radius
        for other in self.scene.foreground_assets:
            if other is asset:
                continue
            if np.linalg.norm(np.asarray(asset.position, np.float64)
                              - np.asarray(other.position, np.float64)) \
                    < r + other.world_radius:
                return True
        return False

    # -------------------------------------------------------------- simulation
    def run(self, frame_start, frame_end):
        scene = self.scene
        dt = 1.0 / (scene.frame_rate * SUBSTEPS)
        movable = [a for a in scene.assets if not a.static]
        collisions = []
        for frame in range(frame_start, frame_end + 1):
            for a in scene.assets:
                a.keyframe_insert('position', frame)
                a.keyframe_insert('quaternion', frame)
            for _ in range(SUBSTEPS):
                for a in movable:
                    a.velocity = np.asarray(a.velocity, np.float64) + GRAVITY * dt
                    a.position = np.asarray(a.position, np.float64) + a.velocity * dt
                    half_h = a.world_radius
                    if a.position[2] < half_h:
                        a.position[2] = half_h
                        if a.velocity[2] < 0.0:
                            vz = -a.velocity[2] * a.restitution
                            a.velocity[2] = vz if abs(vz) > 0.3 else 0.0
                        damp = max(0.0, 1.0 - a.friction * 12.0 * dt)
                        a.velocity[0] *= damp
                        a.velocity[1] *= damp
                self._resolve_pairs(movable, frame, collisions)
        return self._animations(), collisions

    def _resolve_pairs(self, movable, frame, collisions):
        n = len(movable)
        for i in range(n):
            a = movable[i]
            if _is_permeable(a):
                continue
            for j in range(i + 1, n):
                b = movable[j]
                if _is_permeable(b):
                    continue
                delta = np.asarray(b.position, np.float64) - np.asarray(a.position,
                                                                        np.float64)
                dist = np.linalg.norm(delta)
                min_dist = a.world_radius + b.world_radius
                if dist >= min_dist or dist < 1e-9:
                    continue
                normal = delta / dist
                # Positional separation proportional to inverse mass.
                ma, mb = max(a.mass, 1e-6), max(b.mass, 1e-6)
                wa, wb = (1.0 / ma) / (1.0 / ma + 1.0 / mb), \
                    (1.0 / mb) / (1.0 / ma + 1.0 / mb)
                push = (min_dist - dist)
                a.position = a.position - normal * push * wa
                b.position = b.position + normal * push * wb
                # Impulse along the normal with mean restitution.
                rel_v = float(np.dot(b.velocity - a.velocity, normal))
                if rel_v < 0.0:
                    e = 0.5 * (a.restitution + b.restitution)
                    imp = -(1.0 + e) * rel_v / (1.0 / ma + 1.0 / mb)
                    a.velocity = a.velocity - normal * (imp / ma)
                    b.velocity = b.velocity + normal * (imp / mb)
                    collisions.append({
                        'instances': (a.name, b.name), 'frame': int(frame),
                        'position': [float(x) for x in (a.position + delta / 2.0)],
                        'impulse': float(imp),
                    })

    def _animations(self):
        return {a.name: {'frames': sorted(a._frames)} for a in self.scene.assets}
