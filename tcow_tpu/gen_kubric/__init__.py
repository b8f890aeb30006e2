'''
Offline Kubric dataset generation (CPU tool; requires the `kubric` + `bpy` + `pybullet`
stack, which is NOT part of the TPU training image — see each module's import gate).

Capability port of /root/reference/gen_kubric/: MOVi-F-style random scenes with forced
containers/carriers, benchmark scene types, divided (amodal) per-instance re-rendering, and
resumable multiprocess export.
'''
