/**
 * Typed topic stores over the wrapper websocket.
 *
 * The backend speaks JSON frames {topic, data} after a
 * {action: "subscribe", topic} request (wrapper_backend/service.py).
 * Each topic gets a Store: subscribe(cb) -> unsubscribe fn, .value holds
 * the latest payload, .age() the seconds since it arrived. The socket
 * reconnects with exponential backoff and re-subscribes every topic that
 * still has listeners — the analogue of the reference's typed
 * wrapper-bus stores (reference wrapper-frontend/src/lib/wrapper-bus.ts).
 */
export class Store {
  constructor() {
    this.value = null;
    this._stamp = 0;
    this._subs = new Set();
  }

  set(value) {
    this.value = value;
    this._stamp = performance.now();
    for (const cb of this._subs) cb(value);
  }

  age() {
    return this.value === null
      ? Infinity
      : (performance.now() - this._stamp) / 1000;
  }

  subscribe(cb) {
    this._subs.add(cb);
    if (this.value !== null) cb(this.value);
    return () => this._subs.delete(cb);
  }

  get active() {
    return this._subs.size > 0;
  }
}

export class WrapperBus {
  constructor(url, { onStatus } = {}) {
    this.url = url;
    this.onStatus = onStatus || (() => {});
    this._stores = new Map();
    this._ws = null;
    this._backoff = 500;
    this._connect();
  }

  /** Store for a topic; created (and subscribed server-side) on demand. */
  topic(name) {
    let store = this._stores.get(name);
    if (!store) {
      store = new Store();
      this._stores.set(name, store);
      this._send({ action: "subscribe", topic: name });
    }
    return store;
  }

  _send(obj) {
    if (this._ws && this._ws.readyState === WebSocket.OPEN) {
      this._ws.send(JSON.stringify(obj));
    }
  }

  _connect() {
    const ws = new WebSocket(this.url);
    this._ws = ws;
    ws.onopen = () => {
      this._backoff = 500;
      this.onStatus("connected");
      for (const name of this._stores.keys()) {
        this._send({ action: "subscribe", topic: name });
      }
    };
    ws.onmessage = (event) => {
      const frame = JSON.parse(event.data);
      if (frame.error) {
        console.warn("bus error:", frame);
        return;
      }
      const store = this._stores.get(frame.topic);
      if (store) store.set(frame.data);
    };
    ws.onclose = () => {
      this.onStatus("reconnecting…");
      setTimeout(() => this._connect(), this._backoff);
      this._backoff = Math.min(this._backoff * 2, 10000);
    };
    ws.onerror = () => ws.close();
  }
}
