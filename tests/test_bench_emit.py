"""The bench artifact line must fit the driver's stdout tail window.

Round-4 post-mortem (VERDICT r4 weak #1): the driver records only the
LAST 2,000 characters of bench.py's stdout and parses the final line.
BENCH_r04's full-detail superset line was ~3.4 KB, so the driver saw a
mid-line fragment and recorded ``parsed: null`` — a whole round of perf
work with no machine-readable record. ``bench.compact_line`` is the fix;
these tests pin its contract against a maximal-shaped result so the line
can never outgrow the window again.
"""

import json

import bench


def _max_shaped_result():
    """A result dict at least as large as any real bench run produces."""
    result = {
        "metric": "e_align_train_images_per_sec_256",
        "value": 12345.678,
        "unit": "images/sec/chip",
        "vs_baseline": 123.456,
        "ms_per_step": 99999.99,
        "flops_per_step": 1.3803154571264e13,
        "mfu": 0.9999,
        "bytes_per_step": 1.21783828480e11,
        "hbm_frac": 1.1438,
        "m_hbm_gb": 999.999,
        "m_dev_ms": 99999.99,
        "m_mxu": 0.9999,
        "m_hbm_frac": 0.9999,
        "dtype": "float32",
        "workload": "lpips-in-step (6 VGG16 passes/iter, reference parity)",
        "peak_flops_bf16": 197e12,
        "hbm_bytes_per_sec": 819e9,
        "device_kind": "TPU v5 lite",
        "baseline": "97.6 img/s/chip, same workload, round 3/4 record",
        "bench_wall_s": 99999.9,
    }
    extras = []
    for name in bench._SHORT_NAMES:
        extras.append({
            "metric": name,
            "value": 99999.999,
            "unit": "images/sec/chip",
            "ms_per_step": 99999.99,
            "flops_per_step": 1.3803154571264e13,
            "mfu": 0.9999,
            "bytes_per_step": 2.95683358720e11,
            "hbm_frac": 0.9999,
            "dtype": "bfloat16 compute, fp32 master/norms",
            "workload": "off-tick lean step (log-only image branch skipped)",
            "wall_s": 9999.9,
        })
    # worst-case skip/error entries with oversized messages
    extras.append({"metric": "sg2_1024_case2", "skipped": "budget: " + "x" * 400})
    extras.append({"metric": "e_big_512_b8_bf16", "error": "Traceback " + "y" * 400})
    result["extra"] = extras
    return result


def test_compact_line_fits_driver_tail_window():
    line = bench.compact_line(_max_shaped_result())
    assert len(line) <= bench.MAX_LINE_CHARS
    assert bench.MAX_LINE_CHARS <= 1900  # margin inside the 2,000-char tail
    parsed = json.loads(line)
    # driver-required primary fields survive compaction verbatim
    assert parsed["metric"] == "e_align_train_images_per_sec_256"
    assert parsed["value"] == 12345.678
    assert parsed["unit"] == "images/sec/chip"
    assert parsed["vs_baseline"] == 123.456
    # measured-roofline fields ride in the line (VERDICT r4 ask #5)
    assert parsed["m_hbm_frac"] == 0.9999
    assert parsed["m_mxu"] == 0.9999
    # every extra is represented (value or skip/err marker)
    assert len(parsed["extra"]) == len(bench._SHORT_NAMES) + 2
    assert all(("v" in e) or ("skip" in e) or ("err" in e) for e in parsed["extra"])


def test_compact_line_single_physical_line():
    line = bench.compact_line(_max_shaped_result())
    assert "\n" not in line


def test_compact_line_degrades_rather_than_overflows():
    result = _max_shaped_result()
    # an absurd number of extras still cannot overflow the cap
    result["extra"] = result["extra"] * 10
    line = bench.compact_line(result)
    assert len(line) <= bench.MAX_LINE_CHARS
    json.loads(line)


def test_typical_line_keeps_per_extra_mfu():
    """The real ~9-extra shape must fit WITHOUT dropping the mfu fields."""
    result = _max_shaped_result()
    result["extra"] = result["extra"][:9]
    parsed = json.loads(bench.compact_line(result))
    assert all("mfu" in e for e in parsed["extra"])
