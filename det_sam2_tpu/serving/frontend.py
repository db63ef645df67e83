"""Single-page demo frontend (stdlib-served; reference ships a React app,
demo/frontend/ — this is the TPU build's dependency-free equivalent:
gallery, click prompts, streamed propagation overlays)."""

INDEX_HTML = r"""<!doctype html>
<html>
<head>
<meta charset="utf-8"/>
<title>det_sam2_tpu demo</title>
<style>
 body { font-family: system-ui, sans-serif; margin: 1.2rem; background:#111;
        color:#eee; }
 button { margin: 0 .25rem .25rem 0; }
 #frame-wrap { position: relative; display: inline-block; }
 #frame-img, #overlay { max-width: 90vw; }
 #overlay { position: absolute; left: 0; top: 0; pointer-events: none; }
 #log { white-space: pre-wrap; font-family: monospace; font-size: .8rem;
        max-height: 10rem; overflow-y: auto; background: #000; padding: .5rem; }
 input[type=number] { width: 4rem; }
</style>
</head>
<body>
<h2>det_sam2_tpu — interactive video segmentation</h2>
<div>
  <label>video path <input id="video-path" size="48"
    placeholder="/path/to/video.mp4 or frames dir"/></label>
  <button onclick="loadGallery()">gallery</button>
  <select id="gallery" onchange="pickGallery()"></select>
  <button onclick="startSession()">start session</button>
  <button onclick="closeSession()">close</button>
</div>
<div>
  frame <input type="number" id="frame-idx" value="0" min="0"
    onchange="showFrame()"/>
  object <input type="number" id="obj-id" value="1" min="0"/>
  label <select id="pt-label"><option value="1">positive</option>
    <option value="0">negative</option></select>
  <button onclick="clearFrame()">clear prompts in frame</button>
  <button onclick="propagate()">propagate</button>
  <button onclick="cancelProp()">cancel</button>
  <button onclick="resetAll()">reset</button>
</div>
<div id="frame-wrap">
  <img id="frame-img" onclick="clickPoint(event)"/>
  <canvas id="overlay"></canvas>
</div>
<div id="log"></div>
<script>
let SID = null, NFRAMES = 0, VW = 0, VH = 0;
const COLORS = ["#ff3b30","#34c759","#007aff","#ffcc00","#af52de","#ff9500"];
function log(m){ const el = document.getElementById("log");
  el.textContent += m + "\n"; el.scrollTop = el.scrollHeight; }
async function gql(query, variables){
  const r = await fetch("/graphql", {method:"POST",
    headers:{"Content-Type":"application/json"},
    body: JSON.stringify({query, variables})});
  const j = await r.json();
  if (j.errors) { log("error: " + j.errors[0].message); throw j.errors[0]; }
  return j.data;
}
async function loadGallery(){
  const d = await gql("query { videos { edges { node { path width height } } } }");
  const sel = document.getElementById("gallery");
  sel.innerHTML = "";
  for (const e of d.videos.edges){
    const o = document.createElement("option");
    o.value = e.node.path; o.textContent = e.node.path;
    sel.appendChild(o);
  }
  if (sel.options.length) pickGallery();
}
function pickGallery(){
  document.getElementById("video-path").value =
    document.getElementById("gallery").value;
}
async function startSession(){
  const path = document.getElementById("video-path").value;
  const d = await gql(
    "mutation($i: StartSessionInput!) { startSession(input: $i) { sessionId } }",
    {i: {path}});
  SID = d.startSession.sessionId;
  const info = await fetch("/session_info?session_id=" + SID).then(r=>r.json());
  NFRAMES = info.num_frames; VW = info.video_width; VH = info.video_height;
  log(`session ${SID}: ${NFRAMES} frames ${VW}x${VH}`);
  document.getElementById("frame-idx").max = NFRAMES - 1;
  showFrame();
}
function showFrame(){
  if (!SID) return;
  const idx = +document.getElementById("frame-idx").value;
  const img = document.getElementById("frame-img");
  img.src = `/frame?session_id=${SID}&index=${idx}&t=${Date.now()}`;
  img.onload = () => { sizeOverlay(); };
}
function sizeOverlay(){
  const img = document.getElementById("frame-img");
  const cv = document.getElementById("overlay");
  cv.width = img.clientWidth; cv.height = img.clientHeight;
}
async function clickPoint(ev){
  if (!SID) return log("start a session first");
  const img = document.getElementById("frame-img");
  const rect = img.getBoundingClientRect();
  const x = (ev.clientX - rect.left) / rect.width * VW;
  const y = (ev.clientY - rect.top) / rect.height * VH;
  const frameIndex = +document.getElementById("frame-idx").value;
  const objectId = +document.getElementById("obj-id").value;
  const label = +document.getElementById("pt-label").value;
  const d = await gql(
    "mutation($i: AddPointsInput!) { addPoints(input: $i) { frameIndex " +
    "rleMaskList { objectId rleMask { size counts } } } }",
    {i: {sessionId: SID, frameIndex, objectId,
         points: [[x, y]], labels: [label], clearOldPoints: false}});
  drawMasks(d.addPoints.rleMaskList);
}
function decodeRLE(rle){  // column-major uncompressed counts
  const [h, w] = rle.size;
  const m = new Uint8Array(h * w);
  let idx = 0, val = 0;
  for (const c of rle.counts){ m.fill(val, idx, idx + c); idx += c; val ^= 1; }
  return {m, h, w};  // m is column-major
}
function drawMasks(list){
  const cv = document.getElementById("overlay");
  sizeOverlay();
  const ctx = cv.getContext("2d");
  ctx.clearRect(0, 0, cv.width, cv.height);
  for (const item of list){
    const {m, h, w} = decodeRLE(item.rleMask);
    const col = COLORS[item.objectId % COLORS.length];
    const r = parseInt(col.slice(1,3),16), g = parseInt(col.slice(3,5),16),
          b = parseInt(col.slice(5,7),16);
    const imd = ctx.createImageData(w, h);
    for (let x = 0; x < w; x++) for (let y = 0; y < h; y++){
      if (m[x * h + y]){
        const o = (y * w + x) * 4;
        imd.data[o] = r; imd.data[o+1] = g; imd.data[o+2] = b;
        imd.data[o+3] = 140;
      }
    }
    const tmp = document.createElement("canvas");
    tmp.width = w; tmp.height = h;
    tmp.getContext("2d").putImageData(imd, 0, 0);
    ctx.drawImage(tmp, 0, 0, cv.width, cv.height);
  }
}
async function propagate(){
  if (!SID) return log("start a session first");
  const r = await fetch("/propagate_in_video", {method: "POST",
    headers: {"Content-Type": "application/json"},
    body: JSON.stringify({session_id: SID})});
  const reader = r.body.getReader();
  const dec = new TextDecoder();
  let buf = "";
  for (;;){
    const {done, value} = await reader.read();
    if (done) break;
    buf += dec.decode(value, {stream: true});
    let nl;
    while ((nl = buf.indexOf("\n")) >= 0){
      const line = buf.slice(0, nl); buf = buf.slice(nl + 1);
      if (!line.trim()) continue;
      const item = JSON.parse(line);
      document.getElementById("frame-idx").value = item.frame_index;
      showFrame();
      drawMasks(item.results.map(x => ({objectId: x.object_id,
                                        rleMask: x.mask})));
      log(`frame ${item.frame_index}: ${item.results.length} masks`);
    }
  }
  log("propagation done");
}
async function cancelProp(){
  await gql("mutation($i: CancelPropagateInVideoInput!) { " +
    "cancelPropagateInVideo(input: $i) { success } }", {i: {sessionId: SID}});
}
async function clearFrame(){
  const frameIndex = +document.getElementById("frame-idx").value;
  const objectId = +document.getElementById("obj-id").value;
  await gql("mutation($i: ClearPointsInFrameInput!) { " +
    "clearPointsInFrame(input: $i) { success } }",
    {i: {sessionId: SID, frameIndex, objectId}});
  showFrame();
}
async function resetAll(){
  await gql("mutation($i: ClearPointsInVideoInput!) { " +
    "clearPointsInVideo(input: $i) { success } }", {i: {sessionId: SID}});
  showFrame();
}
async function closeSession(){
  if (!SID) return;
  await gql("mutation($i: CloseSessionInput!) { closeSession(input: $i) " +
    "{ success } }", {i: {sessionId: SID}});
  log("session closed"); SID = null;
}
</script>
</body>
</html>
"""
