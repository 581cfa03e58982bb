"""Golden parity with function_tests/test_movie_filter_dose.cpp: the
embedded doseFilter / criticalDose / optimalDose expected values."""
import pytest

from xmipp3_tpu.ops.movie import (critical_dose, dose_filter_value,
                                  optimal_dose, voltage_scaling_factor)


def test_dose_filter_values():
    assert dose_filter_value(4.0, 412084.3) == pytest.approx(0.9999952,
                                                             rel=1e-6)
    assert dose_filter_value(4.0, 12.82717) == pytest.approx(0.8556285,
                                                             rel=1e-6)


def test_voltage_scaling():
    assert voltage_scaling_factor(300.0) == 1.0
    assert voltage_scaling_factor(200.0) == 0.8
    with pytest.raises(ValueError):
        voltage_scaling_factor(120.0)


def test_critical_dose_values():
    assert int(critical_dose(1.8219448e-04, 300.0)) == int(412084.3)
    assert critical_dose(0.3587903, 300.0) == pytest.approx(4.163977,
                                                            rel=1e-6)
    assert critical_dose(0.3587903, 300.0) != pytest.approx(200000)


def test_optimal_dose_value():
    assert optimal_dose(38.49693) == pytest.approx(96.73663, rel=1e-6)
