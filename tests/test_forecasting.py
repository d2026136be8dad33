

def test_arima_auto_order_search(events_like_ds=None):
    import numpy as np
    import pandas as pd
    import ray.data

    from core_ray.dq.forecasting import arima_auto_forecast
    from core_ray.ops.common import TS

    # AR(2)-ish series: the order search should pick p>=1 over p=0
    rng = np.random.default_rng(3)
    n = 120
    v = np.zeros(n)
    for i in range(2, n):
        v[i] = 0.6 * v[i - 1] - 0.3 * v[i - 2] + rng.normal(0, 0.1)
    df = pd.DataFrame(
        {
            TS.TAG: "a",
            TS.TS_US: np.arange(n) * 1_000_000,
            TS.STATUS: "Good",
            TS.VALUE: v + 10.0,
        }
    )
    out = arima_auto_forecast(ray.data.from_pandas(df), horizon=4).to_pandas()
    assert len(out) == 4
    order = out["order"].iloc[0]
    assert order.split(",")[0] != "0"  # searched past the trivial order
    assert out["Value"].notna().all()


def test_holt_forecast_hand_case():
    """Pure trend series 10,12,14,...: level tracks the line, trend -> 2,
    forecasts continue it exactly."""
    import pandas as pd
    import ray.data

    from core_ray.dq import holt_forecast

    n = 8
    df = pd.DataFrame(
        {
            "TagName": ["t"] * n,
            "ts_us": [i * 1_000_000 for i in range(n)],
            "Status": ["Good"] * n,
            "Value": [10.0 + 2.0 * i for i in range(n)],
        }
    )
    out = holt_forecast(
        ray.data.from_pandas(df), horizon=3, step_us=1_000_000
    ).to_pandas().sort_values("EventTime")
    # a perfectly linear series is reproduced exactly by Holt: l_n = x_n,
    # b_n = slope, forecast = x_n + h*slope
    assert out["Value"].tolist() == [26.0, 28.0, 30.0]
    assert out["Status"].unique().tolist() == ["Forecast"]


def test_holt_forecast_short_series_emits_nothing():
    import pandas as pd
    import ray.data

    from core_ray.dq import holt_forecast

    df = pd.DataFrame(
        {"TagName": ["t"], "ts_us": [0], "Status": ["Good"], "Value": [1.0]}
    )
    assert holt_forecast(ray.data.from_pandas(df)).count() == 0


def test_seasonal_decompose_planted_cycle():
    """value = 10*phase + linear drift (period 4, w=5): the additive split
    must reassemble exactly (value == trend + seasonal + resid at 4dp) and
    the seasonal component must order phases correctly."""
    import numpy as np
    import pandas as pd
    import ray.data

    from core_ray.dq import seasonal_decompose

    n, period = 40, 4
    i = np.arange(n)
    vals = 10.0 * (i % period) + 0.5 * i
    df = pd.DataFrame(
        {
            "TagName": ["t"] * n,
            "ts_us": i * 1_000_000,
            "Status": ["Good"] * n,
            "Value": vals,
        }
    )
    out = seasonal_decompose(
        ray.data.from_pandas(df), period=period
    ).to_pandas().sort_values("EventTime").reset_index(drop=True)
    assert len(out) == n - 4  # w=5 -> 2 rows trimmed each end
    recon = out["trend"] + out["seasonal"] + out["resid"]
    assert np.allclose(recon, out["Value"], atol=2e-4)  # 4dp rounding only
    ph = (np.arange(2, n - 2) % period)
    seas = out["seasonal"].to_numpy()
    for p in range(period):  # one seasonal value per phase
        assert np.ptp(seas[ph == p]) < 1e-9


def test_seasonal_decompose_short_series_empty():
    import pandas as pd
    import ray.data

    from core_ray.dq import seasonal_decompose

    df = pd.DataFrame(
        {"TagName": ["t"] * 3, "ts_us": [0, 1, 2], "Status": ["Good"] * 3,
         "Value": [1.0, 2.0, 3.0]}
    )
    assert seasonal_decompose(ray.data.from_pandas(df), period=24).count() == 0


def test_data_binning_exact_arm_separated_clusters():
    """Four well-separated value clusters: the exact-int arm and the float
    arm agree on the (unique) clustering, and bins are ordered with value."""
    import numpy as np
    import pandas as pd
    import ray.data

    from core_ray.dq import data_binning

    rng = np.random.default_rng(9)
    centers = [0.0, 100.0, 200.0, 300.0]
    v = np.concatenate([c + rng.uniform(-1, 1, 50) for c in centers])
    rng.shuffle(v)
    df = pd.DataFrame(
        {
            "TagName": ["t"] * len(v),
            "ts_us": np.arange(len(v)) * 1_000_000,
            "Status": ["Good"] * len(v),
            "Value": v,
        }
    )
    exact = data_binning(
        ray.data.from_pandas(df), n_bins=4, iters=6, exact_decimals=4
    ).to_pandas().sort_values(["EventTime"]).reset_index(drop=True)
    # each true cluster lands in exactly one bin, bins ascend with value
    lab = exact["bin"].to_numpy()
    val = exact["Value"].to_numpy()
    for b in range(4):
        vals_b = val[lab == b]
        assert len(vals_b) == 50
        assert vals_b.max() - vals_b.min() < 3.0
    order = [val[lab == b].mean() for b in range(4)]
    assert order == sorted(order)
