'''Stub `bpy` module: just enough attribute surface for kubric_sim.py (render thread
settings, image loading for the HDRI dome texture).'''


class _Attr:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class _Images:
    def load(self, filepath):
        return _Attr(filepath=filepath)


class _Render(_Attr):
    pass


context = _Attr(scene=_Attr(render=_Render(threads_mode='AUTO', threads=0)))
data = _Attr(images=_Images())
