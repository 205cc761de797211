"""estdepth_tpu — TPU-native epipolar spatio-temporal video depth framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of ESTDepth
(xxlong0/ESTDepth, CVPR 2021): plane-sweep multi-view stereo with a hybrid
2D-context/3D-matching network and an epipolar spatio-temporal transformer
for temporally coherent streaming depth.

Layout conventions (TPU-native, channels-last):
  * images:        [B, H, W, C]
  * volumes:       [B, D, H, W, C]   (D = depth hypothesis planes)
  * camera poses:  [B, 4, 4] cam-to-world
  * intrinsics:    [B, 3, 3]
"""

__version__ = "0.1.0"
