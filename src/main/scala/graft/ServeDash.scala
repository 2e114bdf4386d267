package graft

/** The `/dashboard` static page — the analytics-dashboard half of the
  * reference's rendering layer (Kibana time/geo/leaderboard panels,
  * README.md:22-28), drawn from the same serving API every client uses
  * (`/query/<name>`), dependency-free.
  *
  * Viz method (the dataviz procedure, applied):
  *  - forms by job: KPI stat tiles (headline numbers), a 3-series line
  *    (trend + identity), a single-series area (trend), a horizontal
  *    bar leaderboard (magnitude);
  *  - categorical slots in FIXED entity order (status F/O/P → slots
  *    1/2/3), never by rank; the bar chart is ONE series → slot 1 for
  *    every bar (no value ramp on nominal categories);
  *  - palette = the validated reference instance, three slots, which
  *    pass all-pairs CVD + normal-vision gates in both modes (checked
  *    with the palette validator; light-mode aqua sits below 3:1
  *    contrast → the relief rule: direct labels AND a table view ship);
  *  - marks: 2px lines, round joins; ≥8px end markers with a 2px
  *    surface ring; 10%-opacity area wash; bars ≤24px with a 4px
  *    rounded data-end (square at baseline) and 2px surface gaps;
  *    hairline solid one-step-off gridlines;
  *  - hover layer: crosshair + all-series tooltip on the time charts,
  *    per-mark tooltip on bars; hit targets wider than the marks;
  *    values lead, labels follow, line-keys not boxes;
  *  - a legend for the 3-series chart (none for single-series), direct
  *    end labels, a table view per chart, dark mode as its OWN stepped
  *    palette under both the OS media query and a data-theme toggle;
  *  - filter row: one row above the charts; the window select scopes
  *    every panel below it (client-side slice of the same responses).
  *
  * Untrusted data rule: every category name and value from the API
  * lands in the DOM via textContent/createTextNode — no innerHTML.
  */
private[graft] object ServeDash {

  val Html: String =
    """<!doctype html>
      |<html><head><meta charset="utf-8"/>
      |<title>graft overview</title>
      |<style>
      |.viz-root{
      |  color-scheme:light;
      |  --surface-1:#fcfcfb; --surface-2:#f0efec;
      |  --text-primary:#0b0b0b; --text-secondary:#52514e;
      |  --grid:#e4e3df;
      |  --series-1:#2a78d6; --series-2:#eb6834; --series-3:#1baf7a; --series-4:#8a5cd6;
      |}
      |@media (prefers-color-scheme: dark){
      |  :root:where(:not([data-theme="light"])) .viz-root{
      |    color-scheme:dark;
      |    --surface-1:#1a1a19; --surface-2:#383835;
      |    --text-primary:#ffffff; --text-secondary:#c3c2b7;
      |    --grid:#31312f;
      |    --series-1:#3987e5; --series-2:#d95926; --series-3:#199e70; --series-4:#9a6fe0;
      |  }
      |}
      |:root[data-theme="dark"] .viz-root{
      |  color-scheme:dark;
      |  --surface-1:#1a1a19; --surface-2:#383835;
      |  --text-primary:#ffffff; --text-secondary:#c3c2b7;
      |  --grid:#31312f;
      |  --series-1:#3987e5; --series-2:#d95926; --series-3:#199e70; --series-4:#9a6fe0;
      |}
      |body{margin:0}
      |.viz-root{font-family:system-ui,sans-serif;background:var(--surface-1);
      |  color:var(--text-primary);min-height:100vh;padding:1.5rem;box-sizing:border-box}
      |.wrap{max-width:980px;margin:0 auto}
      |h1{font-size:1.3rem;margin:0 0 .25rem}
      |.sub{color:var(--text-secondary);font-size:.85rem;margin-bottom:1rem}
      |.bar-controls{display:flex;gap:.6rem;align-items:center;margin-bottom:1.2rem}
      |select,button{font:inherit;padding:.35rem .6rem;border:1px solid var(--grid);
      |  border-radius:6px;background:var(--surface-1);color:var(--text-primary)}
      |.kpis{display:grid;grid-template-columns:repeat(auto-fit,minmax(180px,1fr));
      |  gap:.8rem;margin-bottom:1.2rem}
      |.tile{border:1px solid var(--grid);border-radius:10px;padding:.8rem 1rem}
      |.tile .lbl{font-size:.8rem;color:var(--text-secondary)}
      |.tile .val{font-size:1.7rem;font-weight:600;margin-top:.15rem}
      |.card{border:1px solid var(--grid);border-radius:10px;padding:1rem;margin-bottom:1.2rem}
      |.card h2{font-size:.95rem;margin:0 0 .15rem}
      |.card .note{font-size:.78rem;color:var(--text-secondary);margin-bottom:.5rem}
      |.legend{display:flex;gap:1rem;font-size:.8rem;color:var(--text-secondary);margin:.3rem 0 .2rem}
      |.legend .key{display:inline-block;width:14px;height:0;border-top:2px solid;
      |  vertical-align:middle;margin-right:.35rem}
      |svg text{fill:var(--text-secondary);font-size:10px;font-family:system-ui,sans-serif}
      |svg .endlbl{fill:var(--text-primary);font-weight:600}
      |.tip{position:fixed;pointer-events:none;background:var(--surface-1);
      |  border:1px solid var(--grid);border-radius:6px;padding:.45rem .6rem;
      |  font-size:.78rem;display:none;box-shadow:0 2px 8px rgba(0,0,0,.15);z-index:9}
      |.tip .v{font-weight:700;color:var(--text-primary)}
      |.tip .s{color:var(--text-secondary)}
      |.tip .k{display:inline-block;width:10px;border-top:2px solid;vertical-align:middle;margin-right:.3rem}
      |details{margin-top:.4rem}
      |summary{font-size:.8rem;color:var(--text-secondary);cursor:pointer}
      |table{border-collapse:collapse;font-size:.78rem;margin-top:.4rem}
      |td,th{border:1px solid var(--grid);padding:.2rem .5rem;text-align:right;
      |  font-variant-numeric:tabular-nums}
      |th:first-child,td:first-child{text-align:left}
      |</style></head>
      |<body><div class="viz-root"><div class="wrap">
      |<h1>graft overview</h1>
      |<div class="sub">orders, activity and customer geography served live from the catalog — <a href="/ui">search</a></div>
      |<div class="bar-controls">
      |  <label for="win">Window</label>
      |  <select id="win">
      |    <option value="all">All months</option>
      |    <option value="36">Last 36 months</option>
      |    <option value="12">Last 12 months</option>
      |  </select>
      |  <button id="theme" type="button">Toggle theme</button>
      |  <input id="token" placeholder="token (if required)" size="12"/>
      |</div>
      |<div class="kpis" id="kpis"></div>
      |<div class="card">
      |  <h2>Order revenue by month</h2>
      |  <div class="note">monthly revenue per order status (F fulfilled, O open, P pending)</div>
      |  <div class="legend" id="legend1"></div>
      |  <div id="c1"></div>
      |  <details><summary>Data table</summary><div id="t1"></div></details>
      |</div>
      |<div class="card">
      |  <h2>Rolling 7-day active users</h2>
      |  <div class="note">distinct users active in the trailing week of the events stream</div>
      |  <div id="c2"></div>
      |  <details><summary>Data table</summary><div id="t2"></div></details>
      |</div>
      |<div class="card">
      |  <h2>Customers by nation — top 10</h2>
      |  <div class="note">customer counts from the region-nation dimension join</div>
      |  <div id="c3"></div>
      |  <details><summary>Data table</summary><div id="t3"></div></details>
      |</div>
      |<div class="card">
      |  <h2>Customer balance by geo cell</h2>
      |  <div class="note">account balance summed per geohash cell — darker is more</div>
      |  <div id="c4"></div>
      |  <div class="legend" id="legend4"></div>
      |  <details><summary>Data table</summary><div id="t4"></div></details>
      |</div>
      |<div class="card">
      |  <h2>User growth accounting</h2>
      |  <div class="note">daily actives decomposed into new, retained and resurrected; churn plotted below the axis</div>
      |  <div class="legend" id="legend5"></div>
      |  <div id="c5"></div>
      |  <details><summary>Data table</summary><div id="t5"></div></details>
      |</div>
      |<div class="tip" id="tip"></div>
      |<script>
      |"use strict";
      |const $ = id => document.getElementById(id);
      |const NS = "http://www.w3.org/2000/svg";
      |const css = v => getComputedStyle(document.querySelector(".viz-root")).getPropertyValue(v).trim();
      |function el(tag, attrs, parent){
      |  const e = document.createElementNS(NS, tag);
      |  for (const k in attrs) e.setAttribute(k, attrs[k]);
      |  if (parent) parent.appendChild(e);
      |  return e;
      |}
      |const fmt = n => n >= 1e6 ? (n/1e6).toFixed(1) + "M" : n >= 1e3 ? (n/1e3).toFixed(1) + "K" : String(Math.round(n*100)/100);
      |function ticks(max){ // clean round steps, ~4 of them
      |  if (!(max > 0)) return [0]; // degenerate scale: one baseline tick
      |  const raw = max/4, p = Math.pow(10, Math.floor(Math.log10(raw)));
      |  const step = [1,2,5,10].map(m=>m*p).find(s=>s>=raw);
      |  const out = []; for (let v = 0; v <= max; v += step) out.push(v); return out;
      |}
      |function table(into, cols, rows){
      |  const t = document.createElement("table");
      |  const hr = t.insertRow(); for (const c of cols){ const th = document.createElement("th"); th.textContent = c; hr.appendChild(th); }
      |  for (const r of rows){ const tr = t.insertRow(); for (const c of cols){ tr.insertCell().textContent = String(r[c]); } }
      |  into.replaceChildren(t);
      |}
      |const tip = $("tip");
      |function showTip(x, y, build){
      |  tip.replaceChildren(); build(tip);
      |  tip.style.display = "block";
      |  const w = tip.offsetWidth;
      |  tip.style.left = Math.min(x + 14, window.innerWidth - w - 8) + "px";
      |  tip.style.top = (y + 14) + "px";
      |}
      |function hideTip(){ tip.style.display = "none"; }
      |function tipRow(into, color, label, value){
      |  const d = document.createElement("div");
      |  if (color){ const k = document.createElement("span"); k.className = "k"; k.style.borderTopColor = color; d.appendChild(k); }
      |  const v = document.createElement("span"); v.className = "v"; v.textContent = value;
      |  const s = document.createElement("span"); s.className = "s"; s.textContent = " " + label;
      |  d.appendChild(v); d.appendChild(s); into.appendChild(d);
      |}
      |
      |// ---- data ----
      |// token rides as a Bearer header on every /query fetch (the /ui
      |// pattern) and persists in localStorage, so a token-protected
      |// instance renders instead of four permanent 401 panels
      |$("token").value = localStorage.getItem("graft_token") || "";
      |function headers(){
      |  const t = $("token").value.trim();
      |  return t ? {"Authorization": "Bearer " + t} : {};
      |}
      |async function q(name, limit){
      |  const r = await fetch("/query/" + name + "?limit=" + limit, {headers: headers()});
      |  if (!r.ok) throw new Error(name + ": HTTP " + r.status);
      |  return (await r.json()).rows;
      |}
      |let HIST = [], ACT = [], NAT = [], GEO = [], GROWTH = [];
      |
      |// ---- charts (re-entrant renders; window select slices client-side) ----
      |const W = 900, H = 240, M = {l:52, r:46, t:10, b:24};
      |const STATUS = ["F", "O", "P"]; // fixed entity order -> slots 1..3
      |const slot = i => css("--series-" + (i+1));
      |
      |function lineChart(){
      |  const win = $("win").value;
      |  const months = [...new Set(HIST.map(r => r.mon))].sort();
      |  const keep = win === "all" ? months : months.slice(-Number(win));
      |  const ms = new Set(keep);
      |  const byS = {}; for (const s of STATUS) byS[s] = new Map();
      |  for (const r of HIST) if (ms.has(r.mon)) byS[r.st] && byS[r.st].set(r.mon, r.rev);
      |  const maxY = Math.max(...keep.flatMap(m => STATUS.map(s => byS[s].get(m) || 0)));
      |  const x = i => M.l + i * (W - M.l - M.r) / Math.max(1, keep.length - 1);
      |  const y = v => H - M.b - v / maxY * (H - M.t - M.b);
      |  const svg = el("svg", {viewBox: `0 0 ${W} ${H}`, width: "100%"});
      |  for (const tv of ticks(maxY)){
      |    el("line", {x1: M.l, x2: W - M.r, y1: y(tv), y2: y(tv), stroke: css("--grid"), "stroke-width": 1}, svg);
      |    const t = el("text", {x: M.l - 6, y: y(tv) + 3, "text-anchor": "end"}, svg);
      |    t.textContent = fmt(tv);
      |  }
      |  keep.forEach((m, i) => { if (m.endsWith("-01") || keep.length <= 14){
      |    const t = el("text", {x: x(i), y: H - 6, "text-anchor": "middle"}, svg);
      |    t.textContent = keep.length <= 14 ? m : m.slice(0, 4);
      |  }});
      |  STATUS.forEach((s, si) => {
      |    const pts = keep.map((m, i) => [x(i), y(byS[s].get(m) || 0)]);
      |    el("path", {d: "M" + pts.map(p => p.join(",")).join("L"), fill: "none",
      |      stroke: slot(si), "stroke-width": 2, "stroke-linejoin": "round", "stroke-linecap": "round"}, svg);
      |    const last = pts[pts.length - 1];
      |    el("circle", {cx: last[0], cy: last[1], r: 4, fill: slot(si),
      |      stroke: css("--surface-1"), "stroke-width": 2}, svg);
      |    const t = el("text", {x: last[0] + 8, y: last[1] + 3, "class": "endlbl"}, svg);
      |    t.textContent = s;
      |  });
      |  // crosshair + all-series tooltip: aim at the month, not the line
      |  const hair = el("line", {y1: M.t, y2: H - M.b, stroke: css("--text-secondary"),
      |    "stroke-width": 1, visibility: "hidden"}, svg);
      |  const hit = el("rect", {x: M.l, y: M.t, width: W - M.l - M.r, height: H - M.t - M.b,
      |    fill: "transparent"}, svg);
      |  hit.addEventListener("pointermove", ev => {
      |    const r = svg.getBoundingClientRect();
      |    const fx = (ev.clientX - r.left) / r.width * W;
      |    const i = Math.max(0, Math.min(keep.length - 1,
      |      Math.round((fx - M.l) / ((W - M.l - M.r) / Math.max(1, keep.length - 1)))));
      |    hair.setAttribute("x1", x(i)); hair.setAttribute("x2", x(i));
      |    hair.setAttribute("visibility", "visible");
      |    showTip(ev.clientX, ev.clientY, into => {
      |      const h = document.createElement("div"); h.className = "s"; h.textContent = keep[i]; into.appendChild(h);
      |      STATUS.forEach((s, si) => tipRow(into, slot(si), s, fmt(byS[s].get(keep[i]) || 0)));
      |    });
      |  });
      |  hit.addEventListener("pointerleave", () => { hair.setAttribute("visibility", "hidden"); hideTip(); });
      |  $("c1").replaceChildren(svg);
      |  const lg = $("legend1"); lg.replaceChildren();
      |  STATUS.forEach((s, si) => {
      |    const d = document.createElement("span");
      |    const k = document.createElement("span"); k.className = "key"; k.style.borderTopColor = slot(si);
      |    d.appendChild(k); d.appendChild(document.createTextNode(
      |      s === "F" ? "F — fulfilled" : s === "O" ? "O — open" : "P — pending"));
      |    lg.appendChild(d);
      |  });
      |  table($("t1"), ["mon", "st", "n", "rev"], HIST.filter(r => ms.has(r.mon)));
      |  // KPIs scope to the same window
      |  const rows = HIST.filter(r => ms.has(r.mon));
      |  const kp = $("kpis"); kp.replaceChildren();
      |  const tile = (lbl, val) => {
      |    const d = document.createElement("div"); d.className = "tile";
      |    const l = document.createElement("div"); l.className = "lbl"; l.textContent = lbl;
      |    const v = document.createElement("div"); v.className = "val"; v.textContent = val;
      |    d.appendChild(l); d.appendChild(v); kp.appendChild(d);
      |  };
      |  tile("Orders", fmt(rows.reduce((a, r) => a + r.n, 0)));
      |  tile("Revenue", "$" + fmt(rows.reduce((a, r) => a + r.rev, 0)));
      |  tile("Peak 7-day actives", fmt(Math.max(0, ...ACT.map(r => r.active_7d))));
      |}
      |
      |function areaChart(){
      |  const days = ACT.map(r => r.day);
      |  const maxY = Math.max(...ACT.map(r => r.active_7d));
      |  const x = i => M.l + i * (W - M.l - M.r) / Math.max(1, ACT.length - 1);
      |  const y = v => H - M.b - v / maxY * (H - M.t - M.b);
      |  const svg = el("svg", {viewBox: `0 0 ${W} ${H}`, width: "100%"});
      |  for (const tv of ticks(maxY)){
      |    el("line", {x1: M.l, x2: W - M.r, y1: y(tv), y2: y(tv), stroke: css("--grid"), "stroke-width": 1}, svg);
      |    const t = el("text", {x: M.l - 6, y: y(tv) + 3, "text-anchor": "end"}, svg);
      |    t.textContent = fmt(tv);
      |  }
      |  [0, Math.floor(ACT.length / 2), ACT.length - 1].forEach(i => { if (i >= 0 && days[i]){
      |    const t = el("text", {x: x(i), y: H - 6, "text-anchor": "middle"}, svg); t.textContent = days[i];
      |  }});
      |  const pts = ACT.map((r, i) => [x(i), y(r.active_7d)]);
      |  el("path", {d: "M" + M.l + "," + (H - M.b) + "L" + pts.map(p => p.join(",")).join("L")
      |    + "L" + x(ACT.length - 1) + "," + (H - M.b) + "Z", fill: css("--series-1"), opacity: .1}, svg);
      |  el("path", {d: "M" + pts.map(p => p.join(",")).join("L"), fill: "none",
      |    stroke: css("--series-1"), "stroke-width": 2, "stroke-linejoin": "round", "stroke-linecap": "round"}, svg);
      |  const last = pts[pts.length - 1];
      |  el("circle", {cx: last[0], cy: last[1], r: 4, fill: css("--series-1"),
      |    stroke: css("--surface-1"), "stroke-width": 2}, svg);
      |  const t2 = el("text", {x: last[0] + 8, y: last[1] + 3, "class": "endlbl"}, svg);
      |  t2.textContent = fmt(ACT[ACT.length - 1].active_7d);
      |  const hair = el("line", {y1: M.t, y2: H - M.b, stroke: css("--text-secondary"),
      |    "stroke-width": 1, visibility: "hidden"}, svg);
      |  const hit = el("rect", {x: M.l, y: M.t, width: W - M.l - M.r, height: H - M.t - M.b,
      |    fill: "transparent"}, svg);
      |  hit.addEventListener("pointermove", ev => {
      |    const r = svg.getBoundingClientRect();
      |    const fx = (ev.clientX - r.left) / r.width * W;
      |    const i = Math.max(0, Math.min(ACT.length - 1,
      |      Math.round((fx - M.l) / ((W - M.l - M.r) / Math.max(1, ACT.length - 1)))));
      |    hair.setAttribute("x1", x(i)); hair.setAttribute("x2", x(i));
      |    hair.setAttribute("visibility", "visible");
      |    showTip(ev.clientX, ev.clientY, into => {
      |      const h = document.createElement("div"); h.className = "s"; h.textContent = days[i]; into.appendChild(h);
      |      tipRow(into, css("--series-1"), "active (7d)", fmt(ACT[i].active_7d));
      |    });
      |  });
      |  hit.addEventListener("pointerleave", () => { hair.setAttribute("visibility", "hidden"); hideTip(); });
      |  $("c2").replaceChildren(svg);
      |  table($("t2"), ["day", "active_7d"], ACT);
      |}
      |
      |function barChart(){
      |  const rows = [...NAT].sort((a, b) => b.n_customers - a.n_customers).slice(0, 10);
      |  const maxV = Math.max(...rows.map(r => r.n_customers));
      |  const bh = 22, gap = 2, left = 110;
      |  const h = rows.length * (bh + gap) + 20;
      |  const svg = el("svg", {viewBox: `0 0 ${W} ${h}`, width: "100%"});
      |  const xw = v => v / maxV * (W - left - 60);
      |  rows.forEach((r, i) => {
      |    const yy = i * (bh + gap);
      |    const t = el("text", {x: left - 8, y: yy + bh / 2 + 3, "text-anchor": "end"}, svg);
      |    t.textContent = r.n_name;
      |    // 4px rounded data-end, square at the baseline: rounded rect
      |    // overlaid with a square patch on the baseline side
      |    const wv = Math.max(4, xw(r.n_customers));
      |    const bar = el("path", {d: `M${left},${yy} h${wv - 4} a4,4 0 0 1 4,4 v${bh - 8} a4,4 0 0 1 -4,4 h${4 - wv} Z`,
      |      fill: css("--series-1")}, svg);
      |    const vt = el("text", {x: left + wv + 6, y: yy + bh / 2 + 3}, svg);
      |    vt.textContent = String(r.n_customers);
      |    const hit = el("rect", {x: 0, y: yy - gap / 2, width: W, height: bh + gap, fill: "transparent"}, svg);
      |    hit.addEventListener("pointermove", ev => {
      |      bar.setAttribute("opacity", ".8");
      |      showTip(ev.clientX, ev.clientY, into => {
      |        const hh = document.createElement("div"); hh.className = "s";
      |        hh.textContent = r.n_name + " (" + r.r_name + ")"; into.appendChild(hh);
      |        tipRow(into, css("--series-1"), "customers", String(r.n_customers));
      |        tipRow(into, null, "avg balance", fmt(r.avg_acctbal));
      |      });
      |    });
      |    hit.addEventListener("pointerleave", () => { bar.removeAttribute("opacity"); hideTip(); });
      |  });
      |  $("c3").replaceChildren(svg);
      |  table($("t3"), ["n_name", "r_name", "n_customers", "avg_acctbal"], rows);
      |}
      |
      |// geohash -> [latMin, latMax, lonMin, lonMax] (standard base32,
      |// bits interleaved lon-first)
      |const GH32 = "0123456789bcdefghjkmnpqrstuvwxyz";
      |function ghBox(gh){
      |  let lat = [-90, 90], lon = [-180, 180], even = true;
      |  for (const ch of gh){
      |    const cd = GH32.indexOf(ch);
      |    for (let b = 4; b >= 0; b--){
      |      const bit = (cd >> b) & 1, r = even ? lon : lat;
      |      const mid = (r[0] + r[1]) / 2;
      |      if (bit) r[0] = mid; else r[1] = mid;
      |      even = !even;
      |    }
      |  }
      |  return [lat[0], lat[1], lon[0], lon[1]];
      |}
      |// the validated sequential blue ramp (100..700), light->dark = more
      |const SEQ = ["#cde2fb","#9ec5f4","#6da7ec","#3987e5","#256abf","#1c5cab","#104281","#0d366b"];
      |function mapChart(){
      |  const maxV = Math.max(...GEO.map(r => r.sum_bal));
      |  const MW = 900, MH = 450; // equirectangular: 2:1
      |  const px = lon => (lon + 180) / 360 * MW;
      |  const py = lat => (90 - lat) / 180 * MH;
      |  const svg = el("svg", {viewBox: `0 0 ${MW} ${MH}`, width: "100%"});
      |  // recessive graticule every 30 degrees
      |  for (let lon = -150; lon <= 150; lon += 30)
      |    el("line", {x1: px(lon), x2: px(lon), y1: 0, y2: MH, stroke: css("--grid"), "stroke-width": 1}, svg);
      |  for (let lat = -60; lat <= 60; lat += 30)
      |    el("line", {x1: 0, x2: MW, y1: py(lat), y2: py(lat), stroke: css("--grid"), "stroke-width": 1}, svg);
      |  for (const r of GEO){
      |    const [la0, la1, lo0, lo1] = ghBox(r.cell);
      |    const step = SEQ[Math.min(SEQ.length - 1,
      |      Math.floor(r.sum_bal / maxV * (SEQ.length - 1) + 0.5))];
      |    const rect = el("rect", {x: px(lo0), y: py(la1),
      |      width: Math.max(2, px(lo1) - px(lo0)), height: Math.max(2, py(la0) - py(la1)),
      |      fill: step}, svg);
      |    rect.addEventListener("pointermove", ev => {
      |      rect.setAttribute("opacity", ".75");
      |      showTip(ev.clientX, ev.clientY, into => {
      |        const h = document.createElement("div"); h.className = "s";
      |        h.textContent = "cell " + r.cell; into.appendChild(h);
      |        tipRow(into, step, "balance", "$" + fmt(r.sum_bal));
      |        tipRow(into, null, "customers", String(r.n));
      |      });
      |    });
      |    rect.addEventListener("pointerleave", () => { rect.removeAttribute("opacity"); hideTip(); });
      |  }
      |  $("c4").replaceChildren(svg);
      |  // scale legend: the ramp with its endpoints labeled
      |  const lg = $("legend4"); lg.replaceChildren();
      |  const lo = document.createElement("span"); lo.textContent = "$0";
      |  lg.appendChild(lo);
      |  for (const c of SEQ){
      |    const sw = document.createElement("span");
      |    sw.style.cssText = "display:inline-block;width:18px;height:10px;background:" + c;
      |    lg.appendChild(sw);
      |  }
      |  const hi = document.createElement("span"); hi.textContent = "$" + fmt(maxV);
      |  lg.appendChild(hi);
      |  table($("t4"), ["cell", "n", "sum_bal"],
      |    [...GEO].sort((a, b) => b.sum_bal - a.sum_bal).slice(0, 25));
      |}
      |// growth accounting: stacked inflow bars above the axis (new /
      |// retained / resurrected are a PARTITION of the day's actives, so
      |// a stack is the honest form), churn as its own bar below zero —
      |// one shared y-scale, one axis (a flow chart, not dual-axis).
      |const FLOWS = [["new_users","new"],["retained","retained"],["resurrected","resurrected"]];
      |function stackChart(){
      |  const rows = [...GROWTH].sort((a, b) => a.day < b.day ? -1 : 1);
      |  const maxUp = Math.max(...rows.map(r => r.new_users + r.retained + r.resurrected));
      |  const maxDn = Math.max(...rows.map(r => r.churned));
      |  const h = 260, top = 12, bot = 30;
      |  const y0 = top + (h - top - bot) * maxUp / Math.max(1, maxUp + maxDn);
      |  const sy = (h - top - bot) / Math.max(1, maxUp + maxDn); // px per user
      |  const svg = el("svg", {viewBox: `0 0 ${W} ${h}`, width: "100%"});
      |  const bw = Math.max(3, Math.floor((W - M.l - M.r) / Math.max(1, rows.length)) - 2);
      |  const x = i => M.l + i * (W - M.l - M.r) / Math.max(1, rows.length);
      |  // zero baseline, recessive
      |  el("line", {x1: M.l, y1: y0, x2: W - M.r, y2: y0, stroke: css("--grid")}, svg);
      |  rows.forEach((r, i) => {
      |    let yy = y0;
      |    FLOWS.forEach(([k], s) => {
      |      const hh = r[k] * sy;
      |      if (hh > 0){
      |        // 2px surface gap between stacked segments (and ≥1px sliver
      |        // so a tiny nonzero segment stays visible)
      |        el("rect", {x: x(i), y: yy - Math.max(1, hh - 2), width: bw,
      |          height: Math.max(1, hh - 2), fill: slot(s)}, svg);
      |        yy -= hh;
      |      }
      |    });
      |    if (r.churned > 0)
      |      el("rect", {x: x(i), y: y0 + 2, width: bw,
      |        height: Math.max(1, r.churned * sy - 2), fill: css("--series-4")}, svg);
      |    const hit = el("rect", {x: x(i), y: 0, width: bw + 2, height: h, fill: "transparent"}, svg);
      |    hit.addEventListener("pointermove", ev => showTip(ev.clientX, ev.clientY, into => {
      |      const hh = document.createElement("div"); hh.className = "s";
      |      hh.textContent = r.day; into.appendChild(hh);
      |      FLOWS.forEach(([k, lbl], s) => tipRow(into, slot(s), lbl, String(r[k])));
      |      tipRow(into, css("--series-4"), "churned", String(r.churned));
      |    }));
      |    hit.addEventListener("pointerleave", hideTip);
      |  });
      |  // sparse x labels: first / middle / last day
      |  [0, Math.floor(rows.length / 2), rows.length - 1].forEach(i => { if (i >= 0 && rows[i]){
      |    const t = el("text", {x: x(i), y: h - 8}, svg); t.textContent = rows[i].day; }});
      |  const lg = $("legend5"); lg.replaceChildren();
      |  FLOWS.map(([k, lbl], s) => [lbl, slot(s)]).concat([["churned", css("--series-4")]])
      |    .forEach(([lbl, c]) => {
      |      const it = document.createElement("span"); it.className = "item";
      |      const sw = document.createElement("span"); sw.className = "swatch";
      |      sw.style.background = c; it.appendChild(sw);
      |      it.appendChild(document.createTextNode(lbl)); lg.appendChild(it);
      |    });
      |  $("c5").replaceChildren(svg);
      |  table($("t5"), ["day", "new_users", "retained", "resurrected", "churned"], rows);
      |}
      |
      |// each chart guards on ITS dataset: one empty panel must not
      |// blank the other three (an empty ACT dereferencing its last row
      |// previously threw and killed bar+map too)
      |function renderAll(){
      |  if (HIST.length) lineChart();
      |  if (ACT.length) areaChart();
      |  if (NAT.length) barChart();
      |  if (GEO.length) mapChart();
      |  if (GROWTH.length) stackChart();
      |}
      |$("win").addEventListener("input", renderAll);
      |$("theme").addEventListener("click", () => {
      |  const r = document.documentElement;
      |  const dark = getComputedStyle(document.querySelector(".viz-root")).colorScheme.includes("dark");
      |  r.setAttribute("data-theme", dark ? "light" : "dark");
      |  renderAll(); // re-read the CSS custom props for the new mode
      |});
      |async function loadAll(){
      |  try {
      |    [HIST, ACT, NAT, GEO, GROWTH] = await Promise.all([
      |      q("rel_histogram_dense", 600), q("evt_active_users", 600),
      |      q("rel_dim_join_agg", 100), q("geo_cell_agg", 9000),
      |      q("evt_growth_accounting", 600)]);
      |    ACT.sort((a, b) => a.day < b.day ? -1 : 1);
      |    renderAll();
      |  } catch (e) {
      |    const d = document.createElement("div"); d.className = "sub";
      |    d.textContent = "failed to load: " + e; $("kpis").replaceChildren(d);
      |  }
      |}
      |$("token").addEventListener("change", () => {
      |  localStorage.setItem("graft_token", $("token").value.trim());
      |  loadAll(); // re-fetch with the new credential
      |});
      |loadAll();
      |</script></div></body></html>""".stripMargin
}
