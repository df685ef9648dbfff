"""Command-line drivers mirroring the reference's src/*.py entry points.

  train_cas       trainCas / trainCasConst / trainCasLAB / trainCasConstLAB
  test_cas        testCas / testCasConst / testCasLAB / testCasConstLAB
  vis_cas         visCas
  train_cyclegan  train.py (SRCycleGAN)
  test_cyclegan   test.py
"""
