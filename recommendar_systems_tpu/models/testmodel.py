"""TEST (reference `/root/reference/src/models/test.py`).

A scratch clone of FREEDOM selectable via ``-m TEST`` (`test.py:22` defines
``class TEST`` duplicating FREEDOM's mechanism); kept as an alias so the
reference's model catalog maps one-to-one.
"""

from recommendar_systems_tpu.models.freedom import FREEDOM


class TEST(FREEDOM):
    pass


MODEL = TEST
