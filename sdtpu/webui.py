"""Embedded web UI served at / (reference: the frontend submodule baked into
gen_index_html.h and served by routes_index.cpp).

A single-file vanilla-JS client of the server's three API families:
  - capabilities-driven sampler/scheduler pickers (GET /sdcpp/v1/capabilities)
  - LoRA picker from GET /sdapi/v1/loras, upscaler + latent modes from
    GET /sdapi/v1/{upscalers,latent-upscale-modes}
  - txt2img / img2img / video tabs over the native async job API
    (POST /sdcpp/v1/{img_gen,vid_gen} → poll GET /sdcpp/v1/jobs/<id> →
    POST /sdcpp/v1/jobs/<id>/cancel)
  - per-step progress bar, mid-run cancel, highres-fix panel, SLG/APG
    advanced guidance, gallery with download + parameter readback
"""

INDEX_HTML = """<!doctype html>
<html><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width,initial-scale=1">
<title>sdtpu</title>
<style>
:root{--bg:#131318;--panel:#1c1c24;--line:#32323e;--fg:#e8e8ee;--dim:#9a9aac;
      --accent:#5b74ff;--accent2:#3c50c8;--ok:#7fd77f;--err:#ff7f7f}
*{box-sizing:border-box}
body{font-family:system-ui,-apple-system,sans-serif;margin:0;background:var(--bg);
     color:var(--fg)}
header{display:flex;align-items:center;gap:1rem;padding:.7rem 1.2rem;
       border-bottom:1px solid var(--line);background:var(--panel)}
header h1{font-size:1.1rem;margin:0;letter-spacing:.04em}
header .ver{color:var(--dim);font-size:.8rem}
main{display:grid;grid-template-columns:minmax(340px,440px) 1fr;gap:1rem;
     padding:1rem;max-width:1500px;margin:0 auto}
@media(max-width:900px){main{grid-template-columns:1fr}}
.panel{background:var(--panel);border:1px solid var(--line);border-radius:8px;
       padding:1rem}
.tabs{display:flex;gap:.25rem;margin-bottom:.8rem}
.tabs button{flex:1;background:none;border:1px solid var(--line);color:var(--dim);
      border-radius:6px;padding:.45rem;cursor:pointer;font-size:.9rem}
.tabs button.on{background:var(--accent2);border-color:var(--accent);
      color:var(--fg)}
label{display:block;font-size:.78rem;color:var(--dim);margin:.55rem 0 .15rem}
input,textarea,select{width:100%;background:#26262f;color:var(--fg);
      border:1px solid var(--line);border-radius:5px;padding:.42rem;
      font-size:.9rem}
textarea{resize:vertical;font-family:inherit}
.row{display:flex;gap:.6rem}.row>div{flex:1}
details{border:1px solid var(--line);border-radius:6px;margin:.7rem 0;
      padding:.3rem .6rem}
summary{cursor:pointer;color:var(--dim);font-size:.85rem;padding:.25rem 0}
.go{width:100%;background:var(--accent);color:#fff;border:0;border-radius:6px;
      padding:.7rem;font-size:1.02rem;cursor:pointer;margin-top:.9rem}
.go:disabled{opacity:.5;cursor:default}
.cancel{width:100%;background:#69323a;color:#fbb;border:0;border-radius:6px;
      padding:.45rem;cursor:pointer;margin-top:.4rem;display:none}
.bar{height:8px;background:#26262f;border-radius:4px;overflow:hidden;
      margin-top:.7rem;display:none}
.bar>div{height:100%;width:0;background:var(--accent);transition:width .3s}
#status{font-size:.82rem;color:var(--dim);margin-top:.45rem;min-height:1.1em}
#status.err{color:var(--err)}#status.ok{color:var(--ok)}
#gallery{display:grid;grid-template-columns:repeat(auto-fill,minmax(230px,1fr));
      gap:.8rem;align-content:start}
.card{background:var(--panel);border:1px solid var(--line);border-radius:8px;
      overflow:hidden}
.card img,.card video{width:100%;display:block;cursor:zoom-in}
.card .meta{padding:.45rem .6rem;font-size:.72rem;color:var(--dim);
      display:flex;justify-content:space-between;align-items:center}
.card a{color:var(--accent);text-decoration:none}
#lightbox{position:fixed;inset:0;background:#000d;display:none;
      align-items:center;justify-content:center;z-index:9;flex-direction:column}
#lightbox img{max-width:94vw;max-height:84vh}
#lightbox pre{color:var(--dim);font-size:.72rem;max-width:94vw;
      white-space:pre-wrap;margin:.6rem 0 0}
.lora-row{display:flex;gap:.4rem;align-items:center;margin:.25rem 0}
.lora-row select{flex:3}.lora-row input{flex:1}
.lora-row button{background:#3a2a2a;color:#faa;border:0;border-radius:4px;
      cursor:pointer;padding:.35rem .6rem}
.addlora{background:none;border:1px dashed var(--line);color:var(--dim);
      border-radius:5px;width:100%;padding:.3rem;cursor:pointer;margin-top:.3rem}
.drop{border:1px dashed var(--line);border-radius:6px;padding:.6rem;
      text-align:center;color:var(--dim);font-size:.8rem;cursor:pointer}
.drop img{max-width:100%;max-height:140px;margin-top:.4rem}
</style></head><body>
<header><h1>sdtpu</h1><span class="ver" id="ver"></span>
<span class="ver" style="margin-left:auto">native /sdcpp/v1 · A1111 /sdapi/v1 · OpenAI /v1</span>
</header>
<main>
<div class="panel">
 <div class="tabs">
  <button id="tab-txt" class="on" onclick="setTab('txt')">txt2img</button>
  <button id="tab-img" onclick="setTab('img')">img2img</button>
  <button id="tab-vid" onclick="setTab('vid')">video</button>
 </div>
 <label>prompt</label>
 <textarea id="p" rows="3">a photograph of an astronaut riding a horse</textarea>
 <label>negative prompt</label><textarea id="n" rows="1"></textarea>
 <div class="row">
  <div><label>width</label><input id="w" type="number" step="64" value="512"></div>
  <div><label>height</label><input id="h" type="number" step="64" value="512"></div>
  <div><label>steps</label><input id="s" type="number" value="20"></div>
 </div>
 <div class="row">
  <div><label>sampler</label><select id="sampler"></select></div>
  <div><label>scheduler</label><select id="scheduler"></select></div>
 </div>
 <div class="row">
  <div><label>cfg scale</label><input id="c" type="number" step="0.5" value="7"></div>
  <div><label>distilled guidance</label><input id="g" type="number" step="0.5" value="3.5"></div>
  <div><label>seed (-1 random)</label><input id="seed" type="number" value="-1"></div>
  <div><label>batch</label><input id="batch" type="number" value="1" min="1"></div>
 </div>
 <div id="img-extra" style="display:none">
  <label>init image</label>
  <div class="drop" id="drop-init" onclick="pick('init')">click or drop an image
   <img id="prev-init" style="display:none"></div>
  <label>mask (optional, white = repaint)</label>
  <div class="drop" id="drop-mask" onclick="pick('mask')">click or drop a mask
   <img id="prev-mask" style="display:none"></div>
  <label>denoising strength</label>
  <input id="strength" type="number" step="0.05" min="0" max="1" value="0.75">
 </div>
 <div id="vid-extra" style="display:none" class="row">
  <div><label>frames</label><input id="frames" type="number" value="33"></div>
  <div><label>fps</label><input id="fps" type="number" value="16"></div>
 </div>
 <details><summary>LoRA</summary><div id="loras"></div>
  <button class="addlora" onclick="addLora()">+ add LoRA</button></details>
 <details id="hr-panel"><summary>highres fix</summary>
  <label><input id="hr" type="checkbox" style="width:auto"> enable</label>
  <div class="row">
   <div><label>upscaler</label><select id="hr_up"></select></div>
   <div><label>scale</label><input id="hr_scale" type="number" step="0.25" value="2"></div>
  </div>
  <div class="row">
   <div><label>2nd-pass steps (0 = same)</label><input id="hr_steps" type="number" value="0"></div>
   <div><label>denoise strength</label><input id="hr_str" type="number" step="0.05" value="0.7"></div>
  </div>
 </details>
 <details><summary>advanced guidance</summary>
  <div class="row">
   <div><label>clip skip</label><input id="clip_skip" type="number" value="-1"></div>
   <div><label>eta</label><input id="eta" type="number" step="0.05" value="0"></div>
  </div>
  <div class="row">
   <div><label>SLG scale</label><input id="slg" type="number" step="0.5" value="0"></div>
   <div><label>skip layers</label><input id="slg_layers" value="7,8,9"></div>
  </div>
 </details>
 <button class="go" id="go" onclick="gen()">Generate</button>
 <button class="cancel" id="cancel" onclick="cancelJob()">Cancel</button>
 <div class="bar" id="bar"><div id="barfill"></div></div>
 <div id="status"></div>
</div>
<div id="gallery"></div>
</main>
<div id="lightbox" onclick="this.style.display='none'">
 <img id="lb-img"><pre id="lb-meta"></pre></div>
<input type="file" id="file" accept="image/*" style="display:none">
<script>
let tab='txt', curJob=null, files={init:null,mask:null};
function setTab(t){tab=t;
 for(const k of ['txt','img','vid'])
  document.getElementById('tab-'+k).classList.toggle('on',k===t);
 document.getElementById('img-extra').style.display=t==='img'?'':'none';
 document.getElementById('vid-extra').style.display=t==='vid'?'':'none';
 document.getElementById('hr-panel').style.display=t==='txt'?'':'none';
}
async function boot(){
 try{
  const cap=await (await fetch('/sdcpp/v1/capabilities')).json();
  document.getElementById('ver').textContent=cap.version||'';
  fill('sampler',cap.samplers,'euler_a');
  fill('scheduler',cap.schedulers,'discrete');
  const ups=await (await fetch('/sdapi/v1/upscalers')).json();
  const lat=await (await fetch('/sdapi/v1/latent-upscale-modes')).json();
  const names=lat.map(u=>u.name).concat(
    ups.filter(u=>u.model_name).map(u=>u.name));
  fill('hr_up',names,'Latent');
  window._loras=(await (await fetch('/sdapi/v1/loras')).json()).map(l=>l.name);
 }catch(e){setStatus('capabilities fetch failed: '+e,'err')}
}
function fill(id,items,def){
 const el=document.getElementById(id);el.innerHTML='';
 for(const it of items||[]){const o=document.createElement('option');
  o.value=o.textContent=it;if(it===def)o.selected=true;el.appendChild(o);}
}
function addLora(){
 const box=document.getElementById('loras');
 const row=document.createElement('div');row.className='lora-row';
 const sel=document.createElement('select');
 for(const n of window._loras||[]){const o=document.createElement('option');
  o.value=o.textContent=n;sel.appendChild(o);}
 if(!(window._loras||[]).length){const o=document.createElement('option');
  o.textContent='(no loras in --lora-model-dir)';sel.appendChild(o);}
 const mult=document.createElement('input');mult.type='number';
 mult.step='0.05';mult.value='1.0';
 const del=document.createElement('button');del.textContent='×';
 del.onclick=()=>row.remove();
 row.append(sel,mult,del);box.appendChild(row);
}
function pick(which){
 const f=document.getElementById('file');
 f.onchange=()=>{const file=f.files[0];if(!file)return;
  const r=new FileReader();
  r.onload=()=>{files[which]=r.result;
   const img=document.getElementById('prev-'+which);
   img.src=r.result;img.style.display='block';};
  r.readAsDataURL(file);f.value='';};
 f.click();
}
for(const which of ['init','mask']){
 const el=document.getElementById('drop-'+which);
 el.ondragover=e=>e.preventDefault();
 el.ondrop=e=>{e.preventDefault();const file=e.dataTransfer.files[0];
  if(!file)return;const r=new FileReader();
  r.onload=()=>{files[which]=r.result;
   const img=document.getElementById('prev-'+which);
   img.src=r.result;img.style.display='block';};
  r.readAsDataURL(file);};
}
const $=id=>document.getElementById(id);
function setStatus(msg,cls){const st=$('status');
 st.textContent=msg;st.className=cls||'';}
function body(){
 const b={prompt:$('p').value,negative_prompt:$('n').value,
  width:+$('w').value,height:+$('h').value,sample_steps:+$('s').value,
  cfg_scale:+$('c').value,guidance:+$('g').value,seed:+$('seed').value,
  batch_count:+$('batch').value,sample_method:$('sampler').value,
  schedule:$('scheduler').value,clip_skip:+$('clip_skip').value,
  eta:+$('eta').value};
 if(+$('slg').value){b.slg_scale=+$('slg').value;
  b.skip_layers=$('slg_layers').value.split(',').map(Number).filter(x=>!isNaN(x));}
 const loras=[...document.querySelectorAll('.lora-row')].map(r=>({
  name:r.querySelector('select').value,
  multiplier:+r.querySelector('input').value}))
  .filter(l=>l.name&&!l.name.startsWith('('));
 if(loras.length)b.lora=loras;
 if(tab==='img'){
  if(files.init)b.init_image=files.init;
  if(files.mask)b.mask=files.mask;
  b.strength=+$('strength').value;
 }
 if(tab==='vid'){b.video_frames=+$('frames').value;b.fps=+$('fps').value;}
 if(tab==='txt'&&$('hr').checked){
  b.enable_hr=true;b.hr_upscaler=$('hr_up').value;
  b.hr_scale=+$('hr_scale').value;b.hr_steps=+$('hr_steps').value;
  b.denoising_strength=+$('hr_str').value;
 }
 return b;
}
async function gen(){
 $('go').disabled=true;$('cancel').style.display='block';
 $('bar').style.display='block';$('barfill').style.width='0';
 setStatus('submitting…');
 try{
  const ep=tab==='vid'?'/sdcpp/v1/vid_gen':'/sdcpp/v1/img_gen';
  const r=await fetch(ep,{method:'POST',
   headers:{'Content-Type':'application/json'},body:JSON.stringify(body())});
  const job=await r.json();
  if(!r.ok||!job.id)throw new Error(job.error||r.status);
  curJob=job.id;
  for(;;){
   const j=await (await fetch('/sdcpp/v1/jobs/'+curJob)).json();
   if(j.steps)$('barfill').style.width=(100*j.step/j.steps)+'%';
   setStatus(j.status+(j.steps?` — step ${j.step}/${j.steps}`:''));
   if(j.status==='completed'){$('barfill').style.width='100%';
    setStatus('done','ok');render(j.images);break;}
   if(j.status==='failed')throw new Error(j.error||'failed');
   if(j.status==='cancelled'){setStatus('cancelled');break;}
   await new Promise(res=>setTimeout(res,400));
  }
 }catch(e){setStatus(''+e,'err')}
 $('go').disabled=false;$('cancel').style.display='none';curJob=null;
}
async function cancelJob(){
 if(curJob)await fetch('/sdcpp/v1/jobs/'+curJob+'/cancel',{method:'POST'});
}
function render(images){
 const gal=$('gallery');
 for(const item of images||[]){
  if(typeof item!=='string')continue; // trailing audio object on vid_gen
  const card=document.createElement('div');card.className='card';
  const isVid=tab==='vid';
  const mime=isVid?'image/webp':'image/png';
  const src='data:'+mime+';base64,'+item;
  const img=document.createElement('img');img.src=src;
  img.onclick=()=>{$('lb-img').src=src;
   $('lb-meta').textContent=JSON.stringify(body(),null,1);
   $('lightbox').style.display='flex';};
  const meta=document.createElement('div');meta.className='meta';
  const lab=document.createElement('span');
  lab.textContent=new Date().toLocaleTimeString();
  const dl=document.createElement('a');dl.href=src;
  dl.download='sdtpu.'+(isVid?'webp':'png');dl.textContent='download';
  meta.append(lab,dl);card.append(img,meta);gal.prepend(card);
 }
}
setTab('txt');boot();
</script></body></html>
"""
