"""Unit tests for the in-repo JS engine (clearcam_tpu.jsengine).

The engine exists so the web UI can EXECUTE in CI despite the sandbox
having no browser/node (tests/test_ui_exec.py). These tests pin the
language/DOM semantics the UI relies on, so an engine regression localizes
here instead of surfacing as a confusing UI-test failure.
"""
import math

import pytest

from clearcam_tpu.jsengine.es import JSSyntaxError, free_identifiers, parse
from clearcam_tpu.jsengine.dom import Browser, FakeFile
from clearcam_tpu.jsengine.interp import (
    NULL, UNDEF, GlobalEnv, Interpreter, JSThrow, to_py,
)


def run(src, **globals_):
    b = Browser("<html><body></body></html>")
    for k, v in globals_.items():
        b.genv.declare(k, v)
    b.run_script(src)
    return b


def result(src, expr="result", **globals_):
    b = run(src, **globals_)
    return to_py(b.get(expr))


# ---------------------------------------------------------------- language

def test_closures_and_hoisting():
    assert result("""
      function counter(){let n=0;return ()=>++n}
      const c=counter();c();c();
      result=c()+later();   // later is hoisted
      function later(){return 10}
    """) == 13


def test_destructuring_defaults_and_rest():
    assert result("""
      const [a,,b=5,...rest]=[1,2,undefined,4,5];
      const {x,y:z=9}={x:7};
      function f([p,q],...more){return p+q+more.length}
      result=[a,b,rest.join(''),x,z,f([1,2],0,0,0)];
    """) == [1, 5, "45", 7, 9, 6]


def test_spread_and_object_merge_order():
    assert result("""
      const base={a:1,b:2};
      const over={...base,b:9,...{c:3}};
      result=[over.a,over.b,over.c,[0,...[1,2],3].join('')];
    """) == [1, 9, 3, "0123"]


def test_optional_chaining_short_circuits_calls():
    # the whole chain must evaluate to undefined without invoking anything
    assert result("""
      let called=0;
      const hit=()=>{called++;return 1};
      const r1=(undefined)?.foo(hit());
      const r2=(null)?.bar;
      result=[typeof r1,typeof r2,called];
    """) == ["undefined", "undefined", 0]


def test_nullish_vs_or():
    assert result("result=[0??'x', 0||'x', ''??'y', ''||'y', null??'z']") == \
        [0, "x", "", "y", "z"]


def test_loose_vs_strict_equality():
    assert result("""
      result=[1=='1', 1==='1', null==undefined, null===undefined,
              NaN===NaN, true==1, ''==0];
    """) == [True, False, True, False, False, True, True]


def test_toint32_bitops_and_number_formatting():
    assert result("""
      result=[5.9|0, -3.7|0, (2**31)|0, 255&15, 1<<4,
              String(3), String(3.5), (0.1*100).toFixed(0)];
    """) == [5, -3, -(2 ** 31), 15, 16, "3", "3.5", "10"]


def test_template_literals_nested():
    assert result("""
      const who='cam', n=2;
      result=`a${n>1?`multi(${who})`:'solo'}b`;
    """) == "amulti(cam)b"


def test_string_methods():
    assert result("""
      result=['7'.padStart(2,'0'), 'abcdef'.slice(1,-1), 'a,b,,c'.split(',').length,
              ' x '.trim(), 'abc'.includes('bc'), 'MTWTFSS'.split('')[6]];
    """) == ["07", "bcde", 4, "x", True, "S"]


def test_array_methods_and_sort_comparator():
    assert result("""
      const a=[3,1,2];
      a.sort((x,y)=>x-y);
      result=[a.join(''),
              [1,2,3,4].filter(x=>x%2).map(x=>x*10).join('-'),
              [[1],[2,3]].flat().length,
              [5,6].some(x=>x>5), [5,6].every(x=>x>5),
              [1,2,3].reduce((s,x)=>s+x,10)];
    """) == ["123", "10-30", 3, True, False, 16]


def test_async_await_and_promise_rejection():
    assert result("""
      async function boom(){throw {message:'no'}}
      async function main(){
        let caught='';
        try{await boom()}catch(e){caught=e.message}
        const v=await Promise.resolve(41);
        return [caught,v+1];
      }
      main().then(r=>{result=r});
    """) == ["no", 42]


def test_json_roundtrip_skips_undefined_props():
    assert result("""
      const s=JSON.stringify({a:1,b:undefined,c:[1,'x',true,null]});
      result=[s, JSON.parse(s).c[3]===null];
    """) == ['{"a":1,"c":[1,"x",true,null]}', True]


def test_try_catch_without_binding_and_finally():
    assert result("""
      let log='';
      try{throw {message:'e'}}catch{log+='c'}finally{log+='f'}
      result=log;
    """) == "cf"


def test_for_of_entries_and_for_in():
    assert result("""
      let s='';
      for(const [k,v] of Object.entries({a:1,b:2}))s+=k+v;
      for(const k in {x:0,y:0})s+=k;
      result=s;
    """) == "a1b2xy"


def test_getter_free_typeof_undeclared():
    assert result("result=typeof totallyUndeclared") == "undefined"


def test_syntax_error_carries_line_number():
    with pytest.raises(JSSyntaxError, match="line 3"):
        parse("const a=1;\nconst b=2;\nconst c=(1+;\n")


def test_free_identifiers_catches_typos():
    ast = parse("""
      function f(){const good=1;return god+1}
      const outer=f();
    """)
    free = free_identifiers(ast)
    assert "god" in free and "good" not in free and "outer" not in free


def test_asi_expression_continues_across_newlines():
    assert result("result=1\n  +2\n  +3") == 6


# ---------------------------------------------------------------- DOM

def test_innerhtml_parses_and_ids_resolve():
    b = run("""
      const d=document.createElement('div');
      d.innerHTML=`<span id="s1" class="pill">hi</span><input id="i1" type="checkbox" checked>`;
      document.body.appendChild(d);
      result=[document.getElementById('s1').textContent,
              document.getElementById('i1').checked];
    """)
    assert to_py(b.get("result")) == ["hi", True]


def test_select_value_semantics():
    b = run("""
      const sel=document.createElement('select');
      sel.innerHTML='<option value="">all</option>';
      document.body.appendChild(sel);
      sel.add(new Option('d1','d1'));sel.add(new Option('text only'));
      const first=sel.value;           // first option auto-selected
      sel.value='d1';
      result=[first, sel.value, sel.options.length,
              sel.options[2].value];   // no value attr -> text
    """)
    assert to_py(b.get("result")) == ["", "d1", 3, "text only"]


def test_event_bubbling_inline_this_and_document_listener():
    b = Browser("""
      <html><body>
      <div id="outer" onclick="hits.push('outer')">
        <button id="b" onclick="hits.push('inline:'+this.id)">x</button>
      </div>
      <script>
        window.hits=[];
        document.addEventListener('click',e=>hits.push('doc:'+e.target.id));
      </script></body></html>
    """)
    b.click("b")
    assert to_py(b.get("hits")) == ["inline:b", "outer", "doc:b"]


def test_once_listeners_fire_once():
    b = run("""
      const el=document.createElement('video');
      window.fires=0;
      el.addEventListener('loadedmetadata',()=>fires++,{once:true});
      window.el=el;
    """)
    el = b.get("el")
    el.dispatch("loadedmetadata")
    el.dispatch("loadedmetadata")
    assert to_py(b.get("fires")) == 1


def test_named_element_global_access_and_dialog_open_selector():
    b = Browser("""
      <html><body><dialog id="dlg"></dialog>
      <script>
        dlg.showModal();
        window.openNow=!!document.querySelector('dialog[open]');
        dlg.close();
        window.openAfter=!!document.querySelector('dialog[open]');
      </script></body></html>
    """)
    assert to_py(b.get("openNow")) is True
    assert to_py(b.get("openAfter")) is False
    assert b.modals == ["dlg"]


def test_selector_engine_comma_descendant_attr_prefix():
    b = Browser("""
      <html><body><div id="cams">
        <video id="v_a"></video><img id="v_b"><img id="pre">
      </div><video id="stray"></video></body></html>
    """)
    found = b.document.root.select('#cams video, #cams img[id^="v_"]')
    assert [e.attrs["id"] for e in found] == ["v_a", "v_b"]


def test_urlsearchparams_encoding_and_url_host():
    assert to_py(run("""
      const p=new URLSearchParams({cam:'front door',n:'1'});
      p.set('n','2');
      let host='';
      try{host=new URL('http://10.0.0.2:8080/x').host}catch{host='bad'}
      let bad='';
      try{new URL('not a url')}catch{bad='threw'}
      result=[p.toString(),host,bad];
    """).get("result")) == ["cam=front+door&n=2", "10.0.0.2:8080", "threw"]


def test_timers_and_clearinterval():
    b = run("""
      window.ticks=0;
      const t=setInterval(()=>ticks++,1000);
      window.stop=()=>clearInterval(t);
    """)
    b.fire_timers()
    b.fire_timers()
    assert to_py(b.get("ticks")) == 2
    b.call("stop")
    b.fire_timers()
    assert to_py(b.get("ticks")) == 2


def test_filereader_data_url():
    b = run("""
      window.got=null;
      window.go=f=>{const fr=new FileReader();
        fr.onload=()=>{got=fr.result};fr.readAsDataURL(f)};
    """)
    b.call("go", FakeFile("x.jpg", b"\x00\x01", "image/jpeg"))
    assert to_py(b.get("got")) == "data:image/jpeg;base64,AAE="


def test_location_assignment_records_navigation():
    b = run("location='/?cam=gate&start=5'")
    assert b.navigations == ["/?cam=gate&start=5"]
    b.run_script("location.href='/download_day?cam=gate'")
    assert b.navigations[-1] == "/download_day?cam=gate"


def test_fetch_failure_is_catchable():
    def broken(method, url, body):
        raise OSError("connection refused")
    b = Browser("<html><body></body></html>", fetch=broken)
    b.run_script("""
      window.out='';
      fetch('/x').then(()=>{out='ok'}).catch(e=>{out='err'});
    """)
    assert to_py(b.get("out")) == "err"


def test_canvas_records_scaled_ops():
    b = run("""
      const c=document.createElement('canvas');
      c.width=100;c.height=50;
      const ctx=c.getContext('2d');
      ctx.strokeStyle='#fff';ctx.strokeRect(1,2,3,4);
      window.c=c;
    """)
    ctx = b.get("c")._ctx
    assert ("set:strokeStyle", ("#fff",)) in ctx.ops
    assert ("strokeRect", (1.0, 2.0, 3.0, 4.0)) in ctx.ops
