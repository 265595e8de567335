import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, math, time, sys
import jax; jax.config.update("jax_platforms", "cpu")
from dxrpathtracer_tpu.scene.registry import load_scene
from dxrpathtracer_tpu.app.settings import Scenes
from dxrpathtracer_tpu.bake import charts as C

scene, _ = load_scene(Scenes.Stronghold)
pos, tri = np.asarray(scene.positions, np.float64), np.asarray(scene.tri_idx, np.int64)
t = tri.shape[0]
v0,v1,v2 = pos[tri[:,0]],pos[tri[:,1]],pos[tri[:,2]]
n_raw = np.cross(v1-v0,v2-v0); areas=0.5*np.linalg.norm(n_raw,axis=1)
normals = n_raw/np.maximum(np.linalg.norm(n_raw,axis=1,keepdims=True),1e-20)
chart, n_charts = C._grow_charts(pos, tri, normals, areas, 60.0, 4000)
chart_uv = np.zeros((t,3,2)); chart_of = chart.copy(); next_chart=n_charts
for cid in range(n_charts):
    sel = np.nonzero(chart==cid)[0]
    n0 = normals[sel[np.argmax(areas[sel])]]
    t1b,t2b = C._plane_basis(n0)
    verts = pos[tri[sel]]
    uv2 = np.stack([verts@t1b, verts@t2b], axis=-1)
    if sel.size>1 and C._chart_overlap_frac(uv2) > 0.02:
        for j,ti in enumerate(sel):
            tb1,tb2 = C._plane_basis(normals[ti]); vv=pos[tri[ti]]
            chart_uv[ti]=np.stack([vv@tb1,vv@tb2],axis=-1); chart_of[ti]=cid if j==0 else next_chart
            if j>0: next_chart+=1
    else: chart_uv[sel]=uv2
n_charts=next_chart
ids=np.unique(chart_of); bbox_w=np.zeros(n_charts); bbox_h=np.zeros(n_charts)
angles=np.linspace(0.0,math.pi/2.0,16,endpoint=False); cs,sn=np.cos(angles),np.sin(angles)
go=np.argsort(chart_of,kind="stable"); bounds=np.searchsorted(chart_of[go],np.arange(n_charts+1))
for cid in ids:
    sel=go[bounds[cid]:bounds[cid+1]]; uv=chart_uv[sel].reshape(-1,2)
    xr=uv[:,0:1]*cs[None,:]-uv[:,1:2]*sn[None,:]; yr=uv[:,0:1]*sn[None,:]+uv[:,1:2]*cs[None,:]
    wz=xr.max(axis=0)-xr.min(axis=0); hz=yr.max(axis=0)-yr.min(axis=0)
    k=int(np.argmin(wz*hz))
    uv=np.stack([xr[:,k]-xr[:,k].min(), yr[:,k]-yr[:,k].min()],axis=-1); ext=uv.max(axis=0)
    if ext[1]>ext[0]:
        uv=np.stack([uv[:,1],ext[0]-uv[:,0]],axis=-1); ext=ext[::-1]
    chart_uv[sel]=uv.reshape(-1,3,2); bbox_w[cid],bbox_h[cid]=ext[0],ext[1]
area_sum=float(((bbox_w+1e-12)*(bbox_h+1e-12)).sum())
scale0=1.0/max(math.sqrt(area_sum),1e-20); g=2.0/(4096*scale0)
pad_w=bbox_w+2.0*g; pad_h=bbox_h+2.0*g
total=float((pad_w*pad_h).sum()); grid_cols=1024
uvs_of=[None]*n_charts
for c in range(n_charts): uvs_of[c]=chart_uv[go[bounds[c]:bounds[c+1]]]+g
world_area = areas.sum()

for f in [float(x) for x in sys.argv[1:]]:
    t0=time.time()
    atlas_w=max(math.sqrt(total)*f, pad_w.max()); cell=atlas_w/grid_cols
    order=np.argsort(-(pad_w*pad_h),kind="stable")
    spans=[]; hc=[]
    for c in order:
        w_cols=max(int(math.ceil(pad_w[c]/cell)),1)
        pb,pt=C._chart_profiles(uvs_of[c],min(w_cols,grid_cols),cell,g)
        spans.append((np.clip(np.floor(pb/cell).astype(int),0,10**9),
                      np.clip(np.ceil(pt/cell).astype(int),0,10**9)))
        hc.append(int(math.ceil(pad_h[c]/cell))+1)
    rows=int(grid_cols*2.2)
    occ=np.zeros((rows,grid_cols),bool)
    placed=C._grid_fill(occ,spans,hc)
    n_over = int((placed[:,0]<0).sum())
    origin=np.zeros((n_charts,2))
    for j,c in enumerate(order):
        if placed[j][0]>=0: origin[c]=(placed[j][0]*cell+g, placed[j][1]*cell+g)
    final=chart_uv+origin[chart_of][:,None,:]
    ext=final.reshape(-1,2).max(axis=0)+g
    side=float(max(ext[0],ext[1]))
    print(f"f={f}: BLF coverage={world_area/(side*side):.4f} overflow={n_over} ({time.time()-t0:.0f}s)", flush=True)
