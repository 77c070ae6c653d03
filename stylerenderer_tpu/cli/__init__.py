"""Command-line entry points mirroring the reference scripts:

- ``python -m stylerenderer_tpu.cli.prepare_data``  (prepare_data.py)
- ``python -m stylerenderer_tpu.cli.train``         (train.py)
- ``python -m stylerenderer_tpu.cli.generate``      (generate.py)
- ``python -m stylerenderer_tpu.cli.fid``           (fid.py)
- ``python -m stylerenderer_tpu.cli.calc_inception``(calc_inception.py)
- ``python -m stylerenderer_tpu.cli.ppl``           (ppl.py)
- ``python -m stylerenderer_tpu.cli.align``         (utils_face.py pipeline)
- ``python -m stylerenderer_tpu.cli.project``       (render inverting — no
  reference equivalent exists; the paper's reconstruction pipeline)
"""
