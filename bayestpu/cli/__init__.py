"""Command-line entry points mirroring the reference's CLIs (SURVEY §2):

- ``python -m bayestpu.cli.train``    ≙ ``train_qkeras_mcme.py`` + SW ``main.py``
- ``python -m bayestpu.cli.predict``  ≙ ``hls4ml_pred.py`` (acc/ECE/aPE verify)
- ``python -m bayestpu.cli.analyze``  ≙ ``results_analyzer.py`` CLI
- ``python -m bayestpu.cli.time_cost``≙ ``autobayes/time_cost.py``
"""
