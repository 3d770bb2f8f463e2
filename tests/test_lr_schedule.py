import numpy as np

from accel_tpu.core.lr_schedule import lr_steps_from_epochs, warmup_multifactor_schedule


def test_warmup_and_decay():
    s = warmup_multifactor_schedule(
        base_lr=1.0, steps=[100, 200], factor=0.1,
        warmup=True, warmup_lr=0.0, warmup_steps=10,
    )
    np.testing.assert_allclose(float(s(0)), 0.0)
    np.testing.assert_allclose(float(s(5)), 0.5)
    np.testing.assert_allclose(float(s(10)), 1.0)
    np.testing.assert_allclose(float(s(99)), 1.0)
    np.testing.assert_allclose(float(s(100)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(s(250)), 0.01, rtol=1e-6)


def test_steps_from_epochs():
    assert lr_steps_from_epochs("3.333", epoch_size=300) == [999]
    assert lr_steps_from_epochs("2,4", epoch_size=10, begin_epoch=3) == [40]
