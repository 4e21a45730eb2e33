import sys
sys.path.insert(0, "/root/repo")
import shutil; shutil.rmtree("/tmp/v.atc", ignore_errors=True)
import numpy as np
import atlite_tpu, pandas as pd
from atlite_tpu.gis.geometry import box
c = atlite_tpu.Cutout("/tmp/v", module="synthetic",
                      x=slice(-4, 1.5), y=slice(56, 62), time="2013-01-01")
c.prepare()
regions = pd.Series({"n": box(-4, 59, 1.5, 62), "s": box(-4, 56, 1.5, 59)})
out = c.wind("Vestas_V112_3MW", shapes=regions, per_unit=True,
             aggregate_time=None).to_pandas()
assert out.notna().all().all()
c.to_netcdf("/tmp/v_rt.nc")
c2 = atlite_tpu.Cutout("/tmp/v_rt.nc")
assert np.allclose(np.asarray(c2.data["wnd100m"]), np.asarray(c.data["wnd100m"]))
print("library drive + nc roundtrip OK")
