/**
 * Live field canvas: SSL geometry + per-camera detections.
 *
 * Geometry comes from the merged wrapper packet (field lines/arcs in mm,
 * snake_case from MessageToDict); detections from the detection.in topic.
 * Each camera's latest frame is kept and faded out after a second without
 * updates, so a stalled processor is visibly stale rather than frozen.
 */
const BOT_RADIUS = 90; // mm
const BALL_RADIUS = 21.5; // mm
const FADE_S = 1.0;

export class FieldView {
  constructor(canvas) {
    this.canvas = canvas;
    this.ctx = canvas.getContext("2d");
    this.geometry = null;
    this.frames = new Map(); // camera_id -> {det, stamp}
    this.hiddenCameras = new Set();
    this.selected = null; // {camera, team, bot}
  }

  setGeometry(geom) {
    this.geometry = geom || null;
  }

  addDetection(det) {
    this.frames.set(det.camera_id ?? 0, { det, stamp: performance.now() });
  }

  setCameraVisible(cam, visible) {
    if (visible) this.hiddenCameras.delete(cam);
    else this.hiddenCameras.add(cam);
  }

  /** Nearest robot to a canvas click (px), within one robot radius. */
  hitTest(px, py) {
    const t = this._transform();
    let best = null;
    let bestD = BOT_RADIUS * t.scale * 1.5;
    for (const [cam, { det }] of this.frames) {
      if (this.hiddenCameras.has(cam)) continue;
      for (const [key, team] of [
        ["robots_yellow", "yellow"],
        ["robots_blue", "blue"],
      ]) {
        for (const bot of det[key] || []) {
          const d = Math.hypot(
            t.x(Number(bot.x)) - px,
            t.y(Number(bot.y)) - py
          );
          if (d < bestD) {
            bestD = d;
            best = { camera: cam, team, bot };
          }
        }
      }
    }
    this.selected = best;
    return best;
  }

  _transform() {
    const field = this.geometry?.field;
    const length = Number(field?.field_length ?? 9000);
    const width = Number(field?.field_width ?? 6000);
    const boundary = Number(field?.boundary_width ?? 300);
    const w = this.canvas.width;
    const h = this.canvas.height;
    const fullL = length + 2 * boundary;
    const fullW = width + 2 * boundary;
    const scale = Math.min(w / fullL, h / fullW);
    return {
      scale,
      x: (mmx) => w / 2 + mmx * scale,
      y: (mmy) => h / 2 - mmy * scale,
    };
  }

  draw() {
    const { ctx, canvas } = this;
    const parent = canvas.parentElement;
    if (parent && (canvas.width !== parent.clientWidth)) {
      canvas.width = parent.clientWidth;
      canvas.height = Math.round((parent.clientWidth * 2) / 3);
    }
    const t = this._transform();
    ctx.fillStyle = "#14381f";
    ctx.fillRect(0, 0, canvas.width, canvas.height);

    this._drawGeometry(t);
    const now = performance.now();
    for (const [cam, { det, stamp }] of this.frames) {
      if (this.hiddenCameras.has(cam)) continue;
      const age = (now - stamp) / 1000;
      const alpha = Math.max(0.15, 1 - age / FADE_S);
      this._drawDetection(t, det, alpha);
    }
    if (this.selected) this._drawSelection(t);
  }

  _drawSelection(t) {
    // re-resolve the selected robot from the CURRENT frame so the ring
    // follows it; skip (but keep the selection) while its camera is
    // hidden or the robot is momentarily missing
    const { camera, team, bot } = this.selected;
    if (this.hiddenCameras.has(camera)) return;
    const frame = this.frames.get(camera);
    if (!frame) return;
    const key = team === "yellow" ? "robots_yellow" : "robots_blue";
    const live = (frame.det[key] || []).find(
      (b) => b.robot_id === bot.robot_id
    );
    if (!live) return;
    this.selected.bot = live;
    const { ctx } = this;
    const x = t.x(Number(live.x));
    const y = t.y(Number(live.y));
    ctx.strokeStyle = "rgba(255,255,255,0.9)";
    ctx.lineWidth = 2;
    ctx.setLineDash([4, 3]);
    ctx.beginPath();
    ctx.arc(x, y, BOT_RADIUS * t.scale * 1.6, 0, 2 * Math.PI);
    ctx.stroke();
    ctx.setLineDash([]);
  }

  _drawGeometry(t) {
    const { ctx } = this;
    const field = this.geometry?.field;
    if (!field) return;
    ctx.strokeStyle = "rgba(255,255,255,0.85)";
    for (const line of field.field_lines || []) {
      ctx.lineWidth = Math.max(1, Number(line.thickness || 10) * t.scale);
      ctx.beginPath();
      ctx.moveTo(t.x(Number(line.p1.x)), t.y(Number(line.p1.y)));
      ctx.lineTo(t.x(Number(line.p2.x)), t.y(Number(line.p2.y)));
      ctx.stroke();
    }
    for (const arc of field.field_arcs || []) {
      ctx.lineWidth = Math.max(1, Number(arc.thickness || 10) * t.scale);
      ctx.beginPath();
      // SSL arcs are counter-clockwise in field coords; canvas y flips
      ctx.arc(
        t.x(Number(arc.center.x)),
        t.y(Number(arc.center.y)),
        Number(arc.radius) * t.scale,
        -Number(arc.a2 || 2 * Math.PI),
        -Number(arc.a1 || 0)
      );
      ctx.stroke();
    }
  }

  _drawDetection(t, det, alpha) {
    const { ctx } = this;
    const teams = [
      ["robots_yellow", `rgba(255,210,40,${alpha})`],
      ["robots_blue", `rgba(70,140,255,${alpha})`],
    ];
    for (const [key, color] of teams) {
      for (const bot of det[key] || []) {
        const x = t.x(Number(bot.x));
        const y = t.y(Number(bot.y));
        const r = BOT_RADIUS * t.scale;
        ctx.fillStyle = color;
        ctx.beginPath();
        ctx.arc(x, y, r, 0, 2 * Math.PI);
        ctx.fill();
        if (bot.orientation !== undefined) {
          const o = Number(bot.orientation);
          ctx.strokeStyle = `rgba(0,0,0,${alpha})`;
          ctx.lineWidth = 2;
          ctx.beginPath();
          ctx.moveTo(x, y);
          ctx.lineTo(x + Math.cos(o) * r, y - Math.sin(o) * r);
          ctx.stroke();
        }
        if (bot.robot_id !== undefined) {
          ctx.fillStyle = `rgba(0,0,0,${alpha})`;
          ctx.font = `${Math.max(9, r)}px system-ui`;
          ctx.textAlign = "center";
          ctx.textBaseline = "middle";
          ctx.fillText(String(bot.robot_id), x, y - r * 1.6);
        }
      }
    }
    ctx.fillStyle = `rgba(255,120,30,${alpha})`;
    for (const ball of det.balls || []) {
      ctx.beginPath();
      ctx.arc(
        t.x(Number(ball.x)),
        t.y(Number(ball.y)),
        Math.max(2, BALL_RADIUS * t.scale * 1.5),
        0,
        2 * Math.PI
      );
      ctx.fill();
    }
  }
}
