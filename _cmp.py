import pandas as pd, numpy as np
d = pd.read_csv("/tmp/vp/dev1.tsv", sep="\t")
h = pd.read_csv("/tmp/vp/host.tsv", sep="\t")
m = d.merge(h, on=["rsid","chr","bp","a1","a2"], suffixes=("_d","_h"))
imp = m["type_d"]==0
dz = np.abs(m.loc[imp,"z_d"]-m.loc[imp,"z_h"]).max()
di = np.abs(m.loc[imp,"info_d"]-m.loc[imp,"info_h"]).max()
meas = m["type_d"]==1
bit = (m.loc[meas,"z_d"].to_numpy()==m.loc[meas,"z_h"].to_numpy()).all()
print(f"rows={len(m)} imputed={int(imp.sum())} max|dZ|={dz:.2e} max|dInfo|={di:.2e} measured bit-equal={bit}")
assert dz < 1e-3 and bit
print("PARITY OK")
